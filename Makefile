# Convenience targets. The package itself needs no build step (the native
# engine compiles on first use); these wrap the common checks.

PY ?= python
SMOKE_TMP ?= /tmp/priblast_smoke

.PHONY: test test-all smoke bench prewarm clean

test:
	$(PY) -m pytest tests/ -x -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -x -q

# 5-minute end-to-end smoke: tiny db build + ris search on whatever
# accelerator is present (TPU if the plugin claims one, else CPU),
# exact-engine byte parity against the golden outputs.
smoke:
	rm -rf $(SMOKE_TMP) && mkdir -p $(SMOKE_TMP)
	timeout 300 $(PY) -m priblast_tpu db -i tests/data/tiny_db.fa \
	    -o $(SMOKE_TMP)/db --engine exact
	cmp $(SMOKE_TMP)/db.acc tests/golden/tiny/tiny_db.acc
	cmp $(SMOKE_TMP)/db.seq tests/golden/tiny/tiny_db.seq
	cmp $(SMOKE_TMP)/db.ind tests/golden/tiny/tiny_db.ind
	timeout 300 $(PY) -m priblast_tpu ris -i tests/data/tiny_q.fa \
	    -o $(SMOKE_TMP)/out.txt -d $(SMOKE_TMP)/db --engine exact
	@tail -n +3 $(SMOKE_TMP)/out.txt > $(SMOKE_TMP)/body.txt
	@tail -n +3 tests/golden/tiny/predictions.txt > $(SMOKE_TMP)/gold.txt
	cmp $(SMOKE_TMP)/body.txt $(SMOKE_TMP)/gold.txt
	timeout 300 $(PY) -m priblast_tpu ris -i tests/data/tiny_q.fa \
	    -o $(SMOKE_TMP)/out_dev.txt -d $(SMOKE_TMP)/db --engine tpu
	@echo "smoke OK"

bench:
	$(PY) bench.py

# populate the persistent XLA compile cache with the production shape
# ladder (accessibility buckets + search kernels); first-contact runs then
# show no compile component
prewarm:
	$(PY) tools/prewarm.py --max-n 5120 --search

clean:
	rm -rf $(SMOKE_TMP) build __pycache__
