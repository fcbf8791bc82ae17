"""Medium-scale device-vs-host extension-chain field-identity sweep
(round-5 VERDICT weak #7): the two round-4 kernel bugs (helix lookahead
direction, PAD-offset AU read) were invisible on the tiny goldens and
only surfaced at bench scale — this seeded seqgen workload puts
O(100k) candidate pairs and thousands of hits through the full device
search chain (fused expansion + windowed ungapped + gapped DP +
traceback) and requires every non-energy field to equal the native C++
chain. Accessibilities come from the exact engine on both sides, so the
comparison isolates the search kernels and skips the (slow on CPU)
device accessibility compiles."""

import sys

import numpy as np
import pytest

from priblast_tpu.ops import native
from priblast_tpu.search import pipeline as pl
from priblast_tpu.utils import alphabet, store
from priblast_tpu.utils.params import RisParams


@pytest.mark.slow
def test_device_chain_field_identity(tmp_path, repo_root):
    sys.path.insert(0, str(repo_root / "tools"))
    from seqgen import markov_batch

    from priblast_tpu.models import db as db_model
    from priblast_tpu.utils.params import DbParams

    rng = np.random.default_rng(20240821)
    db_lens = [2500 + int(x) for x in rng.integers(-250, 250, 12)]
    q_lens = [800 + int(x) for x in rng.integers(-80, 80, 6)]
    db_fa = tmp_path / "db.fa"
    with open(db_fa, "w") as f:
        for i, s in enumerate(markov_batch(rng, db_lens)):
            f.write(f">t{i}\n{s.tobytes().decode()}\n")
    q_seqs = [s.tobytes().decode() for s in markov_batch(rng, q_lens)]

    db = tmp_path / "swdb"
    db_model.run(DbParams(input=str(db_fa), db_name=str(db),
                          engine="exact"))
    chunks = store.load_chunks(str(db), 8)
    p = RisParams(input="x", output="y", db_name=str(db))
    p.load_db_params()

    queries = []
    for seq in q_seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(seq),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        queries.append((q_enc, native.sa_build(q_enc), q_acc, q_cond))

    qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                         [q[2] for q in queries],
                         [q[3] for q in queries],
                         [q[1] for q in queries])
    dbpack = pl.DbPack(chunks)
    # f64 engine: hit FIELDS must be exact (any index-arithmetic bug fails
    # loudly). The ungapped extension runs the reference's f32 step
    # arithmetic on both sides, but with a different accumulation order
    # than the native engine (~1e-6 energy noise, test_search_kernels
    # tolerance 2e-4) — a gapped argmin sitting on a <1e-6 tie can then
    # legitimately pick an equal-extent alternate traceback. So base pairs
    # must be exact except on hits whose energies differ (the near-tie
    # flips), and those must be rare.
    stream, finished = pl.search_all(p, chunks, queries, qpack, dbpack,
                                     threads=2, dtype="float64")

    n_hits = 0
    flips = 0
    for (qid, cid, _lo, _hi), out in zip(stream.groups, finished):
        q_enc, q_sa, q_acc, q_cond = queries[qid]
        ref = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[cid],
                                  p)
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start",
                  "dbseq_id", "bp_off"):
            assert np.array_equal(out[k], ref[k]), (k, qid, cid)
        nh = len(ref["q_sp"])
        for i in range(nh):
            lo_, hi_ = ref["bp_off"][i], ref["bp_off"][i + 1]
            if np.array_equal(out["bp_q"][lo_:hi_], ref["bp_q"][lo_:hi_]) \
                    and np.array_equal(out["bp_db"][lo_:hi_],
                                       ref["bp_db"][lo_:hi_]):
                continue
            de = abs(float(out["energy"][i]) - float(ref["energy"][i]))
            assert de > 1e-12, \
                ("bp mismatch WITHOUT an energy tie-flip — index bug?",
                 qid, cid, i)
            flips += 1
        n_hits += nh
    # 524 finished hits on this seed; the kernels see ~7k threshold
    # survivors and ~3k post-mid hits before dedup
    assert n_hits > 400, f"workload too hit-sparse to be a sweep: {n_hits}"
    assert flips <= max(2, n_hits // 100), (flips, n_hits)
