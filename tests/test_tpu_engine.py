"""Batched (TPU-architecture) engine vs the exact engine, on the CPU
backend. f64 must agree to fmath-approximation noise; f32 to ~1e-3."""

import numpy as np
import pytest

from priblast_tpu.ops import native
from priblast_tpu.utils import alphabet, fasta


@pytest.fixture(scope="module")
def tiny_batch(data_dir):
    names, seqs = fasta.read_fasta(data_dir / "tiny_db.fa")
    seqs = seqs[:4]
    n_max = max(len(s) for s in seqs)
    codes = np.zeros((len(seqs), n_max), np.uint8)
    lens = np.array([len(s) for s in seqs], np.int32)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = alphabet.access_codes(s)
    exact = [native.raccess(alphabet.access_codes(s), 70, 5) for s in seqs]
    return seqs, codes, lens, exact


@pytest.mark.parametrize("dtype,tol", [("float64", 1e-4), ("float32", 2e-3)])
def test_batched_matches_exact(tiny_batch, dtype, tol):
    from priblast_tpu.accessibility.batched import BatchedRaccess

    seqs, codes, lens, exact = tiny_batch
    acc, cond = BatchedRaccess(70, 5, dtype=dtype).run(codes, lens)
    for i, s in enumerate(seqs):
        ra, rc = exact[i]
        assert np.abs(acc[i, : len(s)] - ra).max() < tol
        assert np.abs(cond[i, : len(s)] - rc).max() < tol


def test_linear_ref_matches_exact(data_dir):
    from priblast_tpu.accessibility.linear_ref import LinearRaccess

    names, seqs = fasta.read_fasta(data_dir / "tiny_db.fa")
    lr = LinearRaccess(70, 5)
    for s in seqs[:3]:
        codes = alphabet.access_codes(s)
        ra, rc = native.raccess(codes, 70, 5)
        a, c = lr.run(codes)
        assert np.abs(a - ra).max() < 1e-4
        assert np.abs(c - rc).max() < 1e-4


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_ris_tpu_engine_end_to_end(tmp_path, data_dir, golden_dir):
    """ris step with --engine tpu (device accessibility + device extension
    pipeline): same hits as the exact engine; energies within f32 engine
    noise at printed precision."""
    from priblast_tpu.models import ris as ris_model
    from priblast_tpu.utils.params import RisParams

    out_tpu = str(tmp_path / "tpu.txt")
    ris_model.run(RisParams(input=str(data_dir / "tiny_q.fa"),
                            output=out_tpu,
                            db_name=str(golden_dir / "tiny" / "tiny_db"),
                            algorithm="block", engine="tpu"))
    exact = open(golden_dir / "tiny" / "predictions.txt").read().splitlines()
    tpu = open(out_tpu).read().splitlines()
    assert len(exact) == len(tpu)
    assert exact[0] == tpu[0] and exact[2] == tpu[2]  # headers
    # param header: identical except the db path spelling
    assert ([f for f in exact[1].split(",") if not f.startswith("database:")]
            == [f for f in tpu[1].split(",") if not f.startswith("database:")])
    for le, lt in zip(exact[3:], tpu[3:]):
        fe, ft = le.split(","), lt.split(",")
        # id, names, lengths, base pairs: exact
        assert fe[:5] == ft[:5] and fe[8:] == ft[8:], (le, lt)
        for a, b in zip(fe[5:8], ft[5:8]):  # energies: f32 engine noise
            assert abs(float(a) - float(b)) < 2e-3, (le, lt)


def test_db_tpu_engine_end_to_end(tmp_path, data_dir, golden_dir):
    """db step with --engine tpu: .seq/.ind/.nam/.bas must still be
    byte-identical (accessibility-independent); .acc within tolerance."""
    import filecmp

    from priblast_tpu.models import db as db_model
    from priblast_tpu.utils.params import DbParams

    db_name = str(tmp_path / "tiny_db")
    db_model.run(DbParams(input=str(data_dir / "tiny_db.fa"), db_name=db_name,
                          algorithm="block", engine="tpu"))
    for ext in ("bas", "seq", "ind", "nam"):
        assert filecmp.cmp(f"{golden_dir}/tiny/tiny_db.{ext}",
                           f"{db_name}.{ext}", shallow=False)
    def parse_acc(path, n_seqs):
        raw = open(path, "rb").read()
        off, out = 0, []
        for _ in range(2 * n_seqs):
            c = int(np.frombuffer(raw, np.int32, 1, off)[0]); off += 4
            out.append(np.frombuffer(raw, np.float32, c, off)); off += 4 * c
        assert off == len(raw)
        return out

    golden = parse_acc(f"{golden_dir}/tiny/tiny_db.acc", 8)
    mine = parse_acc(f"{db_name}.acc", 8)
    for ga, ma in zip(golden, mine):
        assert len(ga) == len(ma)
        assert np.abs(ga - ma).max() < 2e-3


def test_bilinear_tables_bit_exact(monkeypatch):
    """The banded bilinear one-hot MXU table lookups (round 5: replaces the
    ~950 ms of irregular gathers in make_grids/make_outside_grids on TPU)
    must be BIT-EXACT equal to the _packed_take gathers — one-hot rows
    select exactly one f32 entry and precision='highest' keeps every MXU
    product exact."""
    import jax
    import jax.numpy as jnp

    from priblast_tpu.accessibility import batched as ba

    B, N = 3, 150
    w_span, band = 70, 72
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 5, (B, N)).astype(np.int32)  # incl. 0 = unknown
    s_np = np.zeros((B, N + ba.ML + 4), np.int32)
    s_np[:, 1 : N + 1] = codes
    s = jnp.asarray(s_np)
    lengths = jnp.asarray(np.full(B, N, np.int32))
    t = ba.make_tables(w_span, dtype=jnp.dtype("float32"))
    dtype = jnp.float32

    def full(s, lengths):
        g = ba.make_grids(t, s, lengths, N, band, dtype)
        ins = ba.inside_pass(t, g, N, band, B, dtype)
        _, _, _, _, _, multi2, A = ins
        logZ = jnp.take_along_axis(A, lengths[None, :], axis=0)[0]
        Bf = ba.b_outer_scan(ins[0], g.ext_dot, N, band, B, dtype, lengths)
        og = ba.make_outside_grids(t, s, lengths, N, band, dtype, g,
                                   multi2, A, Bf, logZ)
        return g, og

    monkeypatch.setenv("PRIBLAST_BILINEAR_TABLES", "0")
    g0, og0 = jax.jit(full)(s, lengths)
    monkeypatch.setenv("PRIBLAST_BILINEAR_TABLES", "1")
    g1, og1 = jax.jit(full)(s, lengths)
    for p0, p1 in ((g0, g1), (og0, og1)):
        for name in p0._fields:
            a, b = np.asarray(getattr(p0, name)), np.asarray(getattr(p1, name))
            assert np.array_equal(a, b), name
