"""Device search kernels vs the exact engine, staged.

The native chain exposes stage=1 (post seed expansion) and stage=2 (post
ungapped extension); the device ungapped kernel must map stage-1 hits to
stage-2 hits: integer fields exactly, energies to f32 accumulation noise.
The kernels run over flattened cross-query buffers (search/pipeline.py), so
these tests also cover the packing/base-offset contract.
"""

import numpy as np
import pytest

from priblast_tpu.ops import native
from priblast_tpu.search import pipeline as pl
from priblast_tpu.utils import alphabet, fasta, store
from priblast_tpu.utils.params import RisParams


@pytest.fixture(scope="module")
def staged(tmp_path_factory, data_dir):
    from priblast_tpu.models import db as db_model
    from priblast_tpu.utils.params import DbParams

    tmp = tmp_path_factory.mktemp("db_stage")
    db_name = str(tmp / "tiny_db")
    db_model.run(DbParams(input=str(data_dir / "tiny_db.fa"), db_name=db_name,
                          algorithm="block"))
    chunks = store.load_chunks(db_name, 8)
    p = RisParams(input="x", output="y", db_name=db_name, algorithm="block")
    p.load_db_params()

    names, seqs = fasta.read_fasta(data_dir / "tiny_q.fa")
    queries = []
    pres, posts = [], []
    for seq in seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(seq),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        q_sa = native.sa_build(q_enc)
        queries.append((q_enc, q_sa, q_acc, q_cond))
        pres.append(native.search_chunk(q_enc, q_sa, q_acc, q_cond,
                                        chunks[0], p, stage=1))
        posts.append(native.search_chunk(q_enc, q_sa, q_acc, q_cond,
                                         chunks[0], p, stage=2))
    qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                         [q[2] for q in queries],
                         [q[3] for q in queries],
                         [q[1] for q in queries])
    dbpack = pl.DbPack(chunks)
    return chunks, p, queries, qpack, dbpack, pres, posts


def _stream_from(parts, queries, qpack, dbpack, chunks):
    meta = [(qid, 0) for qid in range(len(parts))]
    stream = pl._concat_groups(parts, meta)
    pl._hit_bases(stream, qpack, dbpack, chunks)
    return stream


def test_device_seed_expansion_matches_exact(staged):
    """host DFS candidates -> device expansion == native stage-1 hits
    (positions/ids exact; energies to accumulation noise; f64 exact)."""
    from priblast_tpu.search import seed

    chunks, p, queries, qpack, dbpack, pres, _posts = staged
    cands = seed.seed_candidates(p, chunks, queries)
    stream = seed.expand_stage(p, cands, qpack, dbpack, dtype="float64")
    assert len(stream) > 0
    for (qid, _cid, lo, hi), pre in zip(stream.groups, pres):
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_id",
                  "dbseq_start"):
            assert np.array_equal(stream.soa[k][lo:hi], pre[k]), k
        for k in ("acc_e", "hyb_e", "energy"):
            np.testing.assert_allclose(stream.soa[k][lo:hi], pre[k],
                                       atol=1e-9)


def test_device_ungapped_matches_exact(staged):
    chunks, p, queries, qpack, dbpack, pres, posts = staged
    stream = _stream_from(pres, queries, qpack, dbpack, chunks)
    assert len(stream) > 0
    pl.ungapped_stage(stream, qpack, dbpack, p)
    for (qid, _cid, lo, hi), post in zip(stream.groups, posts):
        for k in ("q_sp", "db_sp", "q_len", "dbseq_start"):
            assert np.array_equal(stream.soa[k][lo:hi], post[k]), k
        for k in ("acc_e", "hyb_e", "energy"):
            np.testing.assert_allclose(stream.soa[k][lo:hi], post[k],
                                       atol=2e-4, rtol=1e-5)


def test_device_gapped_matches_host_oracle(staged):
    """mid hits -> device gapped DP + device traceback == host gapped
    engine (extents, dbseq_start, base pairs exact; energies to
    accumulation noise)."""
    from priblast_tpu.search.gapped import gapped_extend_flat_batch

    chunks, p, queries, qpack, dbpack, _pres, posts = staged
    mids = [native.chain_mid(queries[qid][0], chunks[0], p, post)
            for qid, post in enumerate(posts)]
    stream = _stream_from(mids, queries, qpack, dbpack, chunks)
    assert len(stream) > 0

    keys = (*pl._STREAM_KEYS, "qb", "qab", "dbb", "aoff", "coff")
    sub = {k: stream.soa[k] for k in keys}
    gx, bps, ovf = gapped_extend_flat_batch(
        sub, qpack.bufs, dbpack.bufs, d=p.min_accessible_length,
        dropout=p.drop_out_length_w_gap, min_helix=p.min_helix_length,
        max_ext=64, dtype="float64")
    assert not ovf.any()

    off0 = np.concatenate([[0], np.cumsum(bps["n0"])])
    off1 = np.concatenate([[0], np.cumsum(bps["n1"])])
    for (qid, _cid, lo, hi), mid in zip(stream.groups, mids):
        ref = native.gapped_extend(queries[qid][0], queries[qid][2],
                                   queries[qid][3], chunks[0], p, mid)
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start"):
            assert np.array_equal(gx[k][lo:hi], ref[k]), k
        np.testing.assert_allclose(gx["energy"][lo:hi], ref["energy"],
                                   atol=1e-9)
        np.testing.assert_allclose(gx["acc_e"][lo:hi], ref["acc_e"],
                                   atol=1e-9)
        for gi, i in enumerate(range(lo, hi)):
            got = (list(zip(bps["q0"][off0[i]:off0[i + 1]].tolist(),
                            bps["db0"][off0[i]:off0[i + 1]].tolist()))
                   + list(zip(bps["q1"][off1[i]:off1[i + 1]].tolist(),
                              bps["db1"][off1[i]:off1[i + 1]].tolist())))
            blo, bhi = ref["bp_off"][gi], ref["bp_off"][gi + 1]
            assert got == list(zip(ref["bp_q"][blo:bhi].tolist(),
                                   ref["bp_db"][blo:bhi].tolist()))


def test_device_pipeline_end_to_end(staged):
    """search_all (device ungapped + device gapped + vectorized bp
    assembly) == the full native chain: hit set, extents and base pairs
    exact (f64 device math)."""
    chunks, p, queries, qpack, dbpack, _pres, _posts = staged
    stream, finished = pl.search_all(p, chunks, queries, qpack, dbpack,
                                     dtype="float64")
    checked = 0
    for (qid, cid, _lo, _hi), out in zip(stream.groups, finished):
        q_enc, q_sa, q_acc, q_cond = queries[qid]
        full = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[cid],
                                   p)
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start",
                  "dbseq_id", "bp_q", "bp_db", "bp_off"):
            assert np.array_equal(out[k], full[k]), k
        np.testing.assert_allclose(out["energy"], full["energy"], atol=3e-4)
        checked += len(full["q_sp"])
    assert checked > 0


def test_device_extend_full_chain(staged):
    """stage1 -> device ungapped -> native chain resume == full exact chain
    (extents/base pairs exact on this dataset; energies to f32 noise)."""
    chunks, p, queries, qpack, dbpack, pres, _posts = staged
    stream = _stream_from(pres, queries, qpack, dbpack, chunks)
    pl.ungapped_stage(stream, qpack, dbpack, p)
    checked = 0
    for (qid, _cid, lo, hi), pre in zip(stream.groups, pres):
        q_enc, q_sa, q_acc, q_cond = queries[qid]
        full = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[0], p)
        hits = {k: stream.soa[k][lo:hi] for k in pl._STREAM_KEYS}
        out = native.chain_from_hits(q_enc, q_acc, q_cond, chunks[0], p,
                                     hits)
        assert np.array_equal(out["q_sp"], full["q_sp"])
        assert np.array_equal(out["db_sp"], full["db_sp"])
        assert np.array_equal(out["q_len"], full["q_len"])
        assert np.array_equal(out["bp_q"], full["bp_q"])
        assert np.array_equal(out["bp_db"], full["bp_db"])
        np.testing.assert_allclose(out["energy"], full["energy"],
                                   atol=3e-4, rtol=1e-5)
        checked += len(full["q_sp"])
    assert checked > 0


def test_fused_stage_matches_staged_chain(staged):
    """fused device pass (expand + ungapped + threshold in one program,
    search/fused.py) == native stage-2 hits filtered by the interaction
    threshold: integer fields and grouping exact, energies to f32
    accumulation noise (the ungapped core keeps the reference's f32 step
    arithmetic regardless of dtype, as in the staged path)."""
    from priblast_tpu.search import fused, seed

    chunks, p, queries, qpack, dbpack, _pres, posts = staged
    cands = seed.seed_candidates(p, chunks, queries)
    stream = fused.fused_stage(p, cands, qpack, dbpack, dtype="float64")
    assert len(stream) > 0

    thr = p.interaction_energy_threshold
    for (qid, _cid, lo, hi), post in zip(stream.groups, posts):
        keep = np.asarray(post["energy"]) <= thr
        assert hi - lo == int(keep.sum())
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_id",
                  "dbseq_start"):
            assert np.array_equal(stream.soa[k][lo:hi],
                                  np.asarray(post[k])[keep]), k
        for k in ("acc_e", "hyb_e", "energy"):
            np.testing.assert_allclose(stream.soa[k][lo:hi],
                                       np.asarray(post[k])[keep],
                                       atol=2e-4, rtol=1e-5)


def test_device_pipeline_overflow_fallback(staged):
    """A deliberately tiny device cap (max_ext=8) forces many hits through
    the exact-host overflow fallback; results must STILL equal the full
    native chain (extents, base pairs, energies)."""
    chunks, p, queries, qpack, dbpack, _pres, _posts = staged
    stream, finished = pl.search_all(p, chunks, queries, qpack, dbpack,
                                     dtype="float64", max_ext=8)
    checked = 0
    for (qid, cid, _lo, _hi), out in zip(stream.groups, finished):
        q_enc, q_sa, q_acc, q_cond = queries[qid]
        full = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[cid],
                                   p)
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start",
                  "dbseq_id", "bp_q", "bp_db", "bp_off"):
            assert np.array_equal(out[k], full[k]), k
        np.testing.assert_allclose(out["energy"], full["energy"], atol=3e-4)
        checked += len(full["q_sp"])
    assert checked > 0


def test_fused_wave_autosplit(staged, monkeypatch):
    """A tiny forced pair-wave limit must split the wave (including single
    candidates bigger than a whole sub-wave) and still produce the exact
    unsplit hit stream — no reachable int32 AssertionError."""
    from priblast_tpu.search import fused, seed

    chunks, p, queries, qpack, dbpack, _pres, _posts = staged
    cands = seed.seed_candidates(p, chunks, queries)
    base = fused.fused_stage(p, cands, qpack, dbpack, dtype="float64")
    monkeypatch.setenv("PRIBLAST_PAIR_WAVE_LIMIT", "5000")
    split = fused.fused_stage(p, cands, qpack, dbpack, dtype="float64")
    assert split.groups == base.groups
    for k in base.soa:
        assert np.array_equal(np.asarray(split.soa[k]),
                              np.asarray(base.soa[k])), k
