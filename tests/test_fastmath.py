"""The numpy and JAX fastmath replicas must agree bit-for-bit with each
other (the C++ replica is validated against the golden outputs end-to-end,
and was validated against the reference's fmath directly at build time)."""

import numpy as np

from priblast_tpu.ops import fastmath


def test_expd_basic_values():
    # table-driven approximation: close to exp but not equal
    xs = np.array([0.0, 1.0, -1.0, 10.0, -10.0, 700.0, -700.0])
    got = fastmath.expd(xs)
    assert np.all(np.abs(got / np.exp(xs) - 1) < 1e-6)
    assert fastmath.expd(np.array([-800.0]))[0] == 0.0
    assert np.isinf(fastmath.expd(np.array([800.0]))[0])


def test_logf_basic_values():
    xs = np.array([1.0, 2.0, 0.5, 1e10, 1e-10], dtype=np.float32)
    got = fastmath.logf(xs)
    assert got[0] == 0.0
    assert np.all(np.abs(got - np.log(xs.astype(np.float64))) < 1e-4)


def test_numpy_jax_bitexact():
    rng = np.random.default_rng(1)
    xs = np.concatenate([
        rng.uniform(-750, 750, 20000),
        rng.uniform(-2, 2, 20000),
        np.array([0.0, -0.0, 1.0]),
    ])
    np_e = fastmath.expd(xs)
    jx_e = np.asarray(fastmath.expd_jax(xs))
    assert np.array_equal(np_e.view(np.uint64), jx_e.view(np.uint64))

    pos = np.abs(xs).astype(np.float32) + np.float32(1e-30)
    np_l = fastmath.logf(pos)
    jx_l = np.asarray(fastmath.logf_jax(pos))
    assert np.array_equal(np_l.view(np.uint32), jx_l.view(np.uint32))


def test_logsumexp2():
    a, b = np.array([1.0]), np.array([2.0])
    v = fastmath.logsumexp2(a, b)[0]
    assert abs(v - np.logaddexp(1.0, 2.0)) < 1e-6
    # -INF sentinel of the reference behaves as identity
    neg = np.array([-1000000.0])
    assert fastmath.logsumexp2(neg, b)[0] == 2.0
