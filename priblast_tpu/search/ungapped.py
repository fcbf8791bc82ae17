"""Batched ungapped extension on device (JAX).

The per-hit left/right greedy extension scans of the reference
(src/ungapped_extension.cpp:30-155) run as lockstep vectorized
`lax.while_loop`s over a whole hit batch: each iteration advances every
still-active hit one position, with per-hit gathers from the encoded
sequences and accessibility arrays and packed-index lookups into the raw
Turner tables. Arithmetic follows the reference (float32 accessibility
steps, running/argmin energies); validated elementwise against the exact
engine's post-ungapped hits (tests/test_search_kernels.py).

This is the first piece of the ris chain on device; the gapped extension
DP (a bounded anti-diagonal formulation) is the round-2 follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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


def _loop37(t, q_enc, db_seq, type1, type2, i, j, p, q):
    """Hybridization loop energy on raw tables / 100 (no-bulge variant;
    reference: src/ungapped_extension.cpp:157-186)."""
    u1 = p - i - 1
    u2 = q - j - 1
    a = _mapc(q_enc[jnp.clip(i + 1, 0, q_enc.shape[0] - 1)])
    b = _mapc(db_seq[jnp.clip(j + 1, 0, db_seq.shape[0] - 1)])
    c = _mapc(q_enc[jnp.clip(p - 1, 0, q_enc.shape[0] - 1)])
    dch = _mapc(db_seq[jnp.clip(q - 1, 0, db_seq.shape[0] - 1)])

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


@functools.partial(jax.jit, static_argnums=(10, 11))
def ungapped_extend_device(q_sp, db_sp, length, dbseq_id, dbseq_start,
                           acc_e, hyb_e, q_enc, db_seq, flat,
                           d: int, dropout: int):
    """Extend a batch of hits. flat = (q_acc, q_cond, db_acc, db_cond,
    acc_off, cond_off) with flattened per-sequence accessibility arrays.
    Padding hits must carry dbseq_id = 0 and q_sp/db_sp pointing at
    sentinel/unknown chars so they terminate immediately."""
    t = _tables()
    q_acc, q_cond, db_acc, db_cond, acc_off, cond_off = flat
    bp = t["bp"]
    rt = t["rtype"]

    energy0 = (acc_e + hyb_e).astype(jnp.float32)
    acc_e = acc_e.astype(jnp.float32)
    hyb_e = hyb_e.astype(jnp.float32)
    aoff = acc_off[dbseq_id].astype(jnp.int32)
    coff = cond_off[dbseq_id].astype(jnp.int32)

    def pair_type(qi, di):
        qc = _mapc(q_enc[jnp.clip(qi, 0, q_enc.shape[0] - 1)])
        dc = _mapc(db_seq[jnp.clip(di, 0, db_seq.shape[0] - 1)])
        return bp[qc * 5 + dc]

    # ---- left phase (reference :55-94) ----
    def left_cond(st):
        return jnp.any(st["active"])

    def left_step(st):
        i = st["i"] - 1
        j = st["j"] - 1
        id_end = st["id_end"] + 1
        qc_raw = q_enc[jnp.clip(i, 0, q_enc.shape[0] - 1)]
        dc_raw = db_seq[jnp.clip(j, 0, db_seq.shape[0] - 1)]
        brk = (i < 0) | (j < 0) | (qc_raw < 2) | (dc_raw < 2)
        act = st["active"] & ~brk

        dacc = (q_acc[jnp.clip(i, 0, q_acc.shape[0] - 1)]
                - q_acc[jnp.clip(i + 1, 0, q_acc.shape[0] - 1)]
                + q_cond[jnp.clip(i + d, 0, q_cond.shape[0] - 1)]
                + db_cond[jnp.clip(coff + id_end, 0,
                                   db_cond.shape[0] - 1)]).astype(jnp.float32)
        e = st["e"] + jnp.where(act, dacc, 0.0)
        a = st["a"] + jnp.where(act, dacc, 0.0)

        type1 = pair_type(i, j)
        type2 = rt[pair_type(st["p"], st["q"])]
        paired = act & (type1 != 0)
        le = _loop37(t, q_enc, db_seq, type1, type2, i, j, st["p"], st["q"])
        le = jnp.where(paired, le, 0.0).astype(jnp.float32)
        e = e + le
        hh = st["hh"] + le

        better = paired & (e < st["min_e"])
        min_e = jnp.where(better, e, st["min_e"])
        min_a = jnp.where(better, a, st["min_a"])
        min_h = jnp.where(better, hh, st["min_h"])
        min_p = jnp.where(better, i, st["min_p"])
        min_q = jnp.where(better, j, st["min_q"])
        min_ids = jnp.where(better, st["min_ids"], st["min_ids"])

        p = jnp.where(paired, i, st["p"])
        q = jnp.where(paired, j, st["q"])
        drop = (min_p - i) >= dropout
        active = act & ~drop
        return dict(i=jnp.where(st["active"], i, st["i"]),
                    j=jnp.where(st["active"], j, st["j"]),
                    id_end=jnp.where(st["active"], id_end, st["id_end"]),
                    p=p, q=q, e=e, a=a, hh=hh,
                    min_e=min_e, min_a=min_a, min_h=min_h,
                    min_p=min_p, min_q=min_q, min_ids=min_ids,
                    active=active)

    st = dict(i=q_sp, j=db_sp, id_end=dbseq_start + length - 1,
              p=q_sp, q=db_sp,
              e=energy0, a=acc_e, hh=hyb_e,
              min_e=energy0, min_a=acc_e, min_h=hyb_e,
              min_p=q_sp, min_q=db_sp, min_ids=dbseq_start,
              active=jnp.ones_like(q_sp, dtype=bool))
    st = lax.while_loop(left_cond, left_step, st)
    min_p, min_q = st["min_p"], st["min_q"]
    min_e, min_a, min_h = st["min_e"], st["min_a"], st["min_h"]

    # ---- right phase (reference :96-145) ----
    def right_step(st):
        k = st["k"] + 1
        l = st["l"] + 1
        ids = st["ids"] - 1
        qc_raw = q_enc[jnp.clip(k, 0, q_enc.shape[0] - 1)]
        dc_raw = db_seq[jnp.clip(l, 0, db_seq.shape[0] - 1)]
        brk = (qc_raw < 2) | (dc_raw < 2)
        act = st["active"] & ~brk

        dacc = (q_cond[jnp.clip(k, 0, q_cond.shape[0] - 1)]
                + db_acc[jnp.clip(aoff + ids, 0, db_acc.shape[0] - 1)]
                - db_acc[jnp.clip(aoff + ids + 1, 0, db_acc.shape[0] - 1)]
                + db_cond[jnp.clip(coff + ids + d, 0,
                                   db_cond.shape[0] - 1)]).astype(jnp.float32)
        e = st["e"] + jnp.where(act, dacc, 0.0)
        a = st["a"] + jnp.where(act, dacc, 0.0)

        type2 = rt[pair_type(k, l)]
        type1 = pair_type(st["r"], st["s"])
        paired = act & (type2 != 0)
        le = _loop37(t, q_enc, db_seq, type1, type2, st["r"], st["s"], k, l)
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
               active=jnp.ones_like(q_sp, dtype=bool))
    st2 = lax.while_loop(left_cond, right_step, st2)

    new_len = st2["min_r"] - min_p + 1
    return dict(q_sp=min_p, db_sp=min_q, q_len=new_len, db_len=new_len,
                dbseq_start=st2["min_ids"],
                acc_e=st2["min_a"], hyb_e=st2["min_h"],
                energy=st2["min_e"])
