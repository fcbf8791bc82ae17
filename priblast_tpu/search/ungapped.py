"""Batched ungapped extension on device (JAX), over flattened buffers.

The per-hit left/right greedy extension scans of the reference
(src/ungapped_extension.cpp:30-155) run as lockstep vectorized
`lax.while_loop`s over a whole hit batch: each iteration advances every
still-active hit one position, with per-hit gathers from the encoded
sequences and accessibility arrays and packed-index lookups into the raw
Turner tables. Arithmetic follows the reference (float32 accessibility
steps, running/argmin energies); validated elementwise against the exact
engine's post-ungapped hits (tests/test_search_kernels.py).

Hits are batched ACROSS queries and db chunks: every query/chunk sequence
and accessibility array lives in one flattened device buffer, and each hit
carries base offsets (q_base / q_acc_base / db_base / db acc offsets) into
those buffers. Hit coordinates (q_sp, db_sp) stay local to their query /
chunk, exactly as in the reference; the kernel adds the bases at gather
time. A zero pad byte precedes every region, so the reference's left
boundary stop (sentinel or i < 0) falls out of the same `char < 2` test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from priblast_tpu.utils import jaxcache

jaxcache.enable()  # persistent XLA compile cache for every kernel module


from priblast_tpu.utils import thermo


@functools.lru_cache(maxsize=1)
def _tables_np():
    r = thermo.RAW
    f = lambda x: np.asarray(x, np.float32).reshape(-1)
    return dict(
        bp=r.BP_pair.reshape(-1).astype(np.int32),
        rtype=r.rtype.astype(np.int32),
        stack=f(r.stack37),
        i11=f(r.int11_37),
        i21=f(r.int21_37),
        i22=f(r.int22_37),
        mismI=f(r.mismatchI37),
        intloop=f(r.internal_loop37),
    )


def _tables():
    # jnp constants created per trace (numpy cached) — never leaks tracers
    return {k: jnp.asarray(v) for k, v in _tables_np().items()}


def _mapc(v):
    # encoded char -> energy index (2..5 -> 1..4; soft-masked 6..9 -> 1..4)
    return jnp.where(v <= 5, v - 1, v - 5).astype(jnp.int32)


def _at(buf, pos):
    return buf[jnp.clip(pos, 0, buf.shape[0] - 1)]


def _loop37(t, qbuf, dbuf, type1, type2, fi, fj, fp, fq, u1, u2):
    """Hybridization loop energy on raw tables / 100 (no-bulge variant;
    reference: src/ungapped_extension.cpp:157-186). fi/fj/fp/fq are flat
    buffer positions of the outer (i, j) and inner (p, q) pairs."""
    a = _mapc(_at(qbuf, fi + 1))
    b = _mapc(_at(dbuf, fj + 1))
    c = _mapc(_at(qbuf, fp - 1))
    dch = _mapc(_at(dbuf, fq - 1))

    z_stack = t["stack"][type1 * 7 + type2]
    z11 = t["i11"][((type1 * 8 + type2) * 5 + a) * 5 + b]
    z12 = t["i21"][(((type1 * 8 + type2) * 5 + a) * 5 + dch) * 5 + b]
    z21 = t["i21"][(((type2 * 8 + type1) * 5 + dch) * 5 + a) * 5 + c]
    z22 = t["i22"][((((type1 * 8 + type2) * 5 + a) * 5 + c) * 5 + dch) * 5 + b]
    zgen = (t["intloop"][jnp.clip(u1 + u2, 0, 30)] +
            t["mismI"][(type1 * 5 + a) * 5 + b] +
            t["mismI"][(type2 * 5 + dch) * 5 + c])

    both0 = (u1 == 0) & (u2 == 0)
    z = jnp.where(both0, z_stack,
        jnp.where(u1 + u2 == 2, z11,
        jnp.where((u1 == 1) & (u2 == 2), z12,
        jnp.where((u1 == 2) & (u2 == 1), z21,
        jnp.where((u1 == 2) & (u2 == 2), z22, zgen)))))
    return z / 100.0


def ungapped_core(q_sp, db_sp, length, dbseq_start,
                  acc_e, hyb_e, qb, qab, dbb, aoff, coff,
                  bufs, dbufs, d: int, dropout: int, active0=None):
    """Traceable core of the batched ungapped extension (see
    ungapped_extend_flat for the argument contract). `active0` masks hits
    that should not extend at all (their outputs are their inputs) — used
    by the fused seed-expansion kernel to skip dead lanes without a
    host-side compaction round trip."""
    t = _tables()
    qbuf, q_acc, q_cond = bufs
    dbuf, db_acc, db_cond = dbufs
    bp = t["bp"]
    rt = t["rtype"]

    energy0 = (acc_e + hyb_e).astype(jnp.float32)
    acc_e = acc_e.astype(jnp.float32)
    hyb_e = hyb_e.astype(jnp.float32)

    def pair_type(qi, di):
        # qi/di are local; bases added here
        return bp[_mapc(_at(qbuf, qb + qi)) * 5 + _mapc(_at(dbuf, dbb + di))]

    # ---- left phase (reference :55-94) ----
    def left_cond(st):
        return jnp.any(st["active"])

    def left_step(st):
        i = st["i"] - 1
        j = st["j"] - 1
        id_end = st["id_end"] + 1
        qc_raw = _at(qbuf, qb + i)
        dc_raw = _at(dbuf, dbb + j)
        brk = (i < 0) | (j < 0) | (qc_raw < 2) | (dc_raw < 2)
        act = st["active"] & ~brk

        dacc = (_at(q_acc, qab + i)
                - _at(q_acc, qab + i + 1)
                + _at(q_cond, qab + i + d)
                + _at(db_cond, coff + id_end)).astype(jnp.float32)
        e = st["e"] + jnp.where(act, dacc, 0.0)
        a = st["a"] + jnp.where(act, dacc, 0.0)

        type1 = pair_type(i, j)
        type2 = rt[pair_type(st["p"], st["q"])]
        paired = act & (type1 != 0)
        le = _loop37(t, qbuf, dbuf, type1, type2, qb + i, dbb + j,
                     qb + st["p"], dbb + st["q"],
                     st["p"] - i - 1, st["q"] - j - 1)
        le = jnp.where(paired, le, 0.0).astype(jnp.float32)
        e = e + le
        hh = st["hh"] + le

        better = paired & (e < st["min_e"])
        min_e = jnp.where(better, e, st["min_e"])
        min_a = jnp.where(better, a, st["min_a"])
        min_h = jnp.where(better, hh, st["min_h"])
        min_p = jnp.where(better, i, st["min_p"])
        min_q = jnp.where(better, j, st["min_q"])

        p = jnp.where(paired, i, st["p"])
        q = jnp.where(paired, j, st["q"])
        drop = (min_p - i) >= dropout
        active = act & ~drop
        return dict(i=jnp.where(st["active"], i, st["i"]),
                    j=jnp.where(st["active"], j, st["j"]),
                    id_end=jnp.where(st["active"], id_end, st["id_end"]),
                    p=p, q=q, e=e, a=a, hh=hh,
                    min_e=min_e, min_a=min_a, min_h=min_h,
                    min_p=min_p, min_q=min_q,
                    active=active)

    if active0 is None:
        active0 = jnp.ones_like(q_sp, dtype=bool)
    st = dict(i=q_sp, j=db_sp, id_end=dbseq_start + length - 1,
              p=q_sp, q=db_sp,
              e=energy0, a=acc_e, hh=hyb_e,
              min_e=energy0, min_a=acc_e, min_h=hyb_e,
              min_p=q_sp, min_q=db_sp,
              active=active0)
    st = lax.while_loop(left_cond, left_step, st)
    min_p, min_q = st["min_p"], st["min_q"]
    min_e, min_a, min_h = st["min_e"], st["min_a"], st["min_h"]

    # ---- right phase (reference :96-145) ----
    def right_step(st):
        k = st["k"] + 1
        l = st["l"] + 1
        ids = st["ids"] - 1
        qc_raw = _at(qbuf, qb + k)
        dc_raw = _at(dbuf, dbb + l)
        brk = (qc_raw < 2) | (dc_raw < 2)
        act = st["active"] & ~brk

        dacc = (_at(q_cond, qab + k)
                + _at(db_acc, aoff + ids)
                - _at(db_acc, aoff + ids + 1)
                + _at(db_cond, coff + ids + d)).astype(jnp.float32)
        e = st["e"] + jnp.where(act, dacc, 0.0)
        a = st["a"] + jnp.where(act, dacc, 0.0)

        type2 = rt[pair_type(k, l)]
        type1 = pair_type(st["r"], st["s"])
        paired = act & (type2 != 0)
        le = _loop37(t, qbuf, dbuf, type1, type2, qb + st["r"], dbb + st["s"],
                     qb + k, dbb + l, k - st["r"] - 1, l - st["s"] - 1)
        le = jnp.where(paired, le, 0.0).astype(jnp.float32)
        e = e + le
        hh = st["hh"] + le

        better = paired & (e < st["min_e"])
        min_e = jnp.where(better, e, st["min_e"])
        min_a = jnp.where(better, a, st["min_a"])
        min_h = jnp.where(better, hh, st["min_h"])
        min_r = jnp.where(better, k, st["min_r"])
        min_ids = jnp.where(better, ids, st["min_ids"])

        r = jnp.where(paired, k, st["r"])
        s = jnp.where(paired, l, st["s"])
        drop = (k - min_r) >= dropout
        active = act & ~drop
        return dict(k=jnp.where(st["active"], k, st["k"]),
                    l=jnp.where(st["active"], l, st["l"]),
                    ids=jnp.where(st["active"], ids, st["ids"]),
                    r=r, s=s, e=e, a=a, hh=hh,
                    min_e=min_e, min_a=min_a, min_h=min_h,
                    min_r=min_r, min_ids=min_ids, active=active)

    st2 = dict(k=q_sp + length - 1, l=db_sp + length - 1,
               ids=dbseq_start,
               r=q_sp + length - 1, s=db_sp + length - 1,
               e=min_e, a=min_a, hh=min_h,
               min_e=min_e, min_a=min_a, min_h=min_h,
               min_r=q_sp + length - 1, min_ids=dbseq_start,
               active=active0)
    st2 = lax.while_loop(left_cond, right_step, st2)

    new_len = st2["min_r"] - min_p + 1
    return dict(q_sp=min_p, db_sp=min_q, q_len=new_len, db_len=new_len,
                dbseq_start=st2["min_ids"],
                acc_e=st2["min_a"], hyb_e=st2["min_h"],
                energy=st2["min_e"])


@functools.partial(jax.jit, static_argnums=(13, 14))
def ungapped_extend_flat(q_sp, db_sp, length, dbseq_start,
                         acc_e, hyb_e, qb, qab, dbb, aoff, coff,
                         bufs, dbufs, d: int, dropout: int):
    """Extend a batch of hits over flattened buffers.

    Per-hit arrays (all [B]):
      q_sp/db_sp/length/dbseq_start — hit extent in query-local / chunk-local
        coordinates (reference Hit fields, src/hit.hpp:38-118);
      acc_e/hyb_e — seed energies (f32);
      qb/qab — this hit's query base offsets into the flat encoded / flat
        accessibility buffers; dbb — chunk base into the flat db sequence
        buffer; aoff/coff — absolute offsets of this hit's db sequence's
        accessibility arrays (chunk base + per-sequence offset, precomputed
        on the host).
    bufs = (q_enc_flat, q_acc_flat, q_cond_flat);
    dbufs = (db_seq_flat, db_acc_flat, db_cond_flat).
    Padding hits must carry all-zero bases and q_sp = db_sp = 0, length = 1:
    the leading pad byte of each flat buffer terminates them on step one.
    """
    return ungapped_core(q_sp, db_sp, length, dbseq_start, acc_e, hyb_e,
                         qb, qab, dbb, aoff, coff, bufs, dbufs, d, dropout)
