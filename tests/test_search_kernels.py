"""Device search kernels vs the exact engine, staged.

The native chain exposes stage=1 (post seed expansion) and stage=2 (post
ungapped extension); the device ungapped kernel must map stage-1 hits to
stage-2 hits: integer fields exactly, energies to f32 accumulation noise.
"""

import numpy as np
import pytest

from priblast_tpu.ops import native
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
    out = []
    for seq in seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(seq),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        q_sa = native.sa_build(q_enc)
        pre = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[0], p,
                                  stage=1)
        post = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[0], p,
                                   stage=2)
        out.append((q_enc, q_acc, q_cond, pre, post))
    return chunks[0], p, out


def test_device_ungapped_matches_exact(staged):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from priblast_tpu.search.ungapped import ungapped_extend_device

    chunk, p, cases = staged
    total = 0
    for q_enc, q_acc, q_cond, pre, post in cases:
        n = len(pre["q_sp"])
        if n == 0:
            continue
        total += n
        flat = (jnp.asarray(chunk.acc), jnp.asarray(chunk.cond),
                jnp.asarray(chunk.acc), jnp.asarray(chunk.cond),
                jnp.asarray(chunk.acc_off), jnp.asarray(chunk.cond_off))
        # note: q side uses its own arrays
        res = ungapped_extend_device(
            jnp.asarray(pre["q_sp"]), jnp.asarray(pre["db_sp"]),
            jnp.asarray(pre["q_len"]), jnp.asarray(pre["dbseq_id"]),
            jnp.asarray(pre["dbseq_start"]),
            jnp.asarray(pre["acc_e"], dtype=jnp.float32),
            jnp.asarray(pre["hyb_e"], dtype=jnp.float32),
            jnp.asarray(q_enc.astype(np.int32)),
            jnp.asarray(chunk.seqs.astype(np.int32)),
            (jnp.asarray(q_acc), jnp.asarray(q_cond),
             jnp.asarray(chunk.acc), jnp.asarray(chunk.cond),
             jnp.asarray(chunk.acc_off), jnp.asarray(chunk.cond_off)),
            p.min_accessible_length, p.drop_out_length_wo_gap)

        assert np.array_equal(np.asarray(res["q_sp"]), post["q_sp"])
        assert np.array_equal(np.asarray(res["db_sp"]), post["db_sp"])
        assert np.array_equal(np.asarray(res["q_len"]), post["q_len"])
        assert np.array_equal(np.asarray(res["dbseq_start"]),
                              post["dbseq_start"])
        for k in ("acc_e", "hyb_e", "energy"):
            np.testing.assert_allclose(np.asarray(res[k]), post[k],
                                       atol=2e-4, rtol=1e-5)
    assert total > 0


def test_device_gapped_matches_host_oracle(staged):
    """mid hits -> device gapped DP + host traceback == host gapped engine
    (extents, dbseq_start, base pairs exact; energies to accumulation
    noise)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from priblast_tpu.search.chain import ChunkDevice, QueryDevice
    from priblast_tpu.search.gapped import gapped_extend_batch

    chunk, p, cases = staged
    cdev = ChunkDevice(chunk)
    total = 0
    for q_enc, q_acc, q_cond, _pre, post in cases:
        if len(post["q_sp"]) == 0:
            continue
        mid = native.chain_mid(q_enc, chunk, p, post)
        if len(mid["q_sp"]) == 0:
            continue
        ref = native.gapped_extend(q_enc, q_acc, q_cond, chunk, p, mid)
        qdev = QueryDevice(q_enc, q_acc, q_cond)
        gx, gbps, ovf = gapped_extend_batch(
            mid, qdev.enc, cdev.seqs, qdev.acc, qdev.cond, cdev.acc,
            cdev.cond, cdev.acc_off, cdev.cond_off,
            d=p.min_accessible_length, dropout=p.drop_out_length_w_gap,
            min_helix=p.min_helix_length, max_ext=64, dtype="float64")
        assert not ovf.any()
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start"):
            assert np.array_equal(gx[k], ref[k]), k
        np.testing.assert_allclose(gx["energy"], ref["energy"], atol=1e-9)
        np.testing.assert_allclose(gx["acc_e"], ref["acc_e"], atol=1e-9)
        for i in range(len(mid["q_sp"])):
            lo, hi = ref["bp_off"][i], ref["bp_off"][i + 1]
            assert gbps[i] == list(zip(ref["bp_q"][lo:hi].tolist(),
                                       ref["bp_db"][lo:hi].tolist()))
        total += len(mid["q_sp"])
    assert total > 0


def test_device_chain_end_to_end(staged):
    """search_chunk_device (device ungapped + device gapped) == the full
    native chain: hit set, extents and base pairs exact."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from priblast_tpu.search.chain import QueryDevice, search_chunk_device

    chunk, p, cases = staged
    checked = 0
    for q_enc, q_acc, q_cond, _pre, _post in cases:
        q_sa = native.sa_build(q_enc)
        full = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunk, p)
        out = search_chunk_device(q_enc, q_sa, q_acc, q_cond, chunk, p,
                                  dtype="float64",
                                  qdev=QueryDevice(q_enc, q_acc, q_cond))
        for k in ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start",
                  "dbseq_id", "bp_q", "bp_db", "bp_off"):
            assert np.array_equal(out[k], full[k]), k
        np.testing.assert_allclose(out["energy"], full["energy"], atol=3e-4)
        checked += len(full["q_sp"])
    assert checked > 0


def test_device_extend_full_chain(staged):
    """stage1 -> device ungapped -> native chain resume == full exact chain
    (extents/base pairs exact on this dataset; energies to f32 noise)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from priblast_tpu.search.ungapped import ungapped_extend_device

    chunk, p, cases = staged
    checked = 0
    for q_enc, q_acc, q_cond, pre, _post in cases:
        q_sa = native.sa_build(q_enc)
        full = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunk, p)
        n = len(pre["q_sp"])
        if n == 0:
            assert len(full["q_sp"]) == 0
            continue
        res = ungapped_extend_device(
            jnp.asarray(pre["q_sp"]), jnp.asarray(pre["db_sp"]),
            jnp.asarray(pre["q_len"]), jnp.asarray(pre["dbseq_id"]),
            jnp.asarray(pre["dbseq_start"]),
            jnp.asarray(pre["acc_e"], dtype=jnp.float32),
            jnp.asarray(pre["hyb_e"], dtype=jnp.float32),
            jnp.asarray(q_enc.astype(np.int32)),
            jnp.asarray(chunk.seqs.astype(np.int32)),
            (jnp.asarray(q_acc), jnp.asarray(q_cond),
             jnp.asarray(chunk.acc), jnp.asarray(chunk.cond),
             jnp.asarray(chunk.acc_off), jnp.asarray(chunk.cond_off)),
            p.min_accessible_length, p.drop_out_length_wo_gap)
        hits = {k: np.asarray(v) for k, v in res.items()}
        hits["dbseq_id"] = pre["dbseq_id"]
        out = native.chain_from_hits(q_enc, q_acc, q_cond, chunk, p, hits)
        assert np.array_equal(out["q_sp"], full["q_sp"])
        assert np.array_equal(out["db_sp"], full["db_sp"])
        assert np.array_equal(out["q_len"], full["q_len"])
        assert np.array_equal(out["bp_q"], full["bp_q"])
        assert np.array_equal(out["bp_db"], full["bp_db"])
        np.testing.assert_allclose(out["energy"], full["energy"],
                                   atol=3e-4, rtol=1e-5)
        checked += len(full["q_sp"])
    assert checked > 0
