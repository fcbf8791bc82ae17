"""Pallas per-diagonal sweep for the gapped extension DP.

The XLA while-loop form (search/gapped.py) is floor-bound at ~0.9 ms per
diagonal: its rolling windows (hyb/admission + the VM/ZW/AU plane
lookbacks, ~40 MB at B=4096) live in HBM and are re-streamed through
small fusion-island ops every iteration (round-4 ablation, NOTES.md).
This kernel keeps ALL rolling state in VMEM scratch as circular rings
(mod-(dropout+2) row indexing — no physical shifts) and streams only the
per-diagonal plane ROWS from HBM via BlockSpec index maps:

  grid = (B-block, diagonal L = 1..max_ext), scratch persists across L
  rings: hyb window, admission window, VM / ZW / AU plane lookbacks
  per-L streamed inputs: current-diag plane rows (MS, STK*, V11..V22,
    NZ0, W0, AU0, BAD), previous-diag rows for the ring inserts
    (VM, ZW, AU0), and the sheared extdb row
  per-L output: the packed predecessor row (traceback stays in XLA)

Per-lane gathers the XLA form used (stems[0] first-admitted-cell bits,
extq[argmin]) are replaced by order-encoding MIN reductions and one-hot
sums, which Mosaic lowers as plain vector ops.

Arithmetic is a line-for-line transcription of gapped.py's body() in the
same operation order, so f32 results are bit-identical; the acceptance
gates are the interpret-mode equality test and the device-vs-host
field-identity sweep. Reference: src/gapped_extension.cpp:213-319.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_PICK = np.int32(2 ** 30)


def _srk(x, n: int, fill):
    """Static sublane shift: out[i] = x[i - n], `fill` for i < n."""
    if n == 0:
        return x
    y = pltpu.roll(x, n, axis=0)
    ii = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(ii < n, jnp.asarray(fill, x.dtype), y)


def _sweep_kernel(ms_r, stk00_r, stk10_r, stk01_r, v11_r, v12_r, v21_r,
                  v22_r, nz0_r, w0_r, au0c_r, bad_r, vmp_r, zwp_r, aup_r,
                  extd_r, extq_r, mq_r, md_r, orig_r, oadm_r, mtz0_r,
                  mtw0_r, pf_r, pred_o, ints_o, floats_o,
                  ring_h, ring_a, ring_vm, ring_zw, ring_au, mt_s, sti,
                  stf, *, W: int, dropout: int, BB: int, max_ext: int,
                  combos, intloop_c, bulge_c, tau: float):
    RH = dropout + 2
    PAD = dropout + 2
    PW = W + PAD
    ME1 = max_ext + 1
    l = pl.program_id(1)
    L = l + 1
    f32 = jnp.float32
    INF = f32(np.inf)
    TAU = f32(tau)

    def phi(D):
        # ring row of diagonal D (offset keeps the mod positive; D >= -RH)
        return (D + 64 * RH) % RH

    # ---- init at the first diagonal of each B-block ----------------------
    @pl.when(l == 0)
    def _():
        ring_h[...] = jnp.full((RH, PW, BB), INF, f32)
        ring_a[...] = jnp.zeros((RH, W, BB), f32)
        ring_vm[...] = jnp.zeros((RH, PW, BB), f32)
        ring_zw[...] = jnp.zeros((RH, PW, BB), jnp.int32)
        ring_au[...] = jnp.zeros((RH, PW, BB), f32)
        # diag-0 rows: origin hyb (lane-padded with INF) + admission
        ring_h[0] = orig_r[...]
        ring_a[0] = oadm_r[...]
        # mt state rows: 0/1 = mtz_m1/mtw_m1 (diag -1: all type-0),
        # 2/3 = mtz_0/mtw_0 (diag 0: origin bits, from the XLA preamble)
        mt_s[0] = jnp.ones((W, BB), f32)
        mt_s[1] = jnp.zeros((W, BB), f32)
        mt_s[2] = mtz0_r[...]
        mt_s[3] = mtw0_r[...]
        pf = pf_r[...]          # rows: valid, energy0, acc0
        sti[...] = jnp.zeros((8, BB), jnp.int32)
        sti[0] = (pf[0] > 0.5).astype(jnp.int32)       # active
        stf[...] = jnp.zeros((8, BB), f32)
        stf[0] = pf[1]                                  # min_e
        stf[1] = pf[2]                                  # min_a

    # ---- ring inserts: previous diagonal's plane rows --------------------
    ring_vm[pl.ds(phi(L - 1), 1)] = vmp_r[...]
    ring_zw[pl.ds(phi(L - 1), 1)] = zwp_r[...]
    ring_au[pl.ds(phi(L - 1), 1)] = aup_r[...]

    active_r = sti[0:1] > 0                             # [1, BB]
    min_e = stf[0:1]
    min_a = stf[1:2]
    min_i = sti[1:2]
    min_j = sti[2:3]
    min_len = sti[3:4]
    ovf = sti[4:5]

    nz0 = nz0_r[0] > 0.5                                # [W, BB]
    w0 = w0_r[0] > 0.5
    au0 = au0c_r[0, PAD:PAD + W] > 0.5
    badr = bad_r[0] > 0.5
    ms = ms_r[0]
    extdb_j = extd_r[0]
    extq_i = extq_r[...]
    maxq = mq_r[0:1]                                    # [1, BB]
    maxd = md_r[0:1]

    # hoisted ring rows: window row r holds diagonal L + r - RH
    rows_h, rows_a, rows_vm, rows_zw, rows_au = {}, {}, {}, {}, {}
    for r in range(RH):
        p = phi(L + r - RH)
        rows_h[r] = ring_h[pl.ds(p, 1)][0]
        rows_a[r] = ring_a[pl.ds(p, 1)][0]
        rows_vm[r] = ring_vm[pl.ds(p, 1)][0]
        rows_zw[r] = ring_zw[pl.ds(p, 1)][0]
        rows_au[r] = ring_au[pl.ds(p, 1)][0]

    # ---- stems[0] fallback bits: first admitted cell in (diag, k) order,
    # as an order-encoding MIN (code = pos*4 | z*2 | w; smallest pos wins)
    ii = lax.broadcasted_iota(jnp.int32, (W, BB), 0)
    pick = None
    for r in range(RH):
        zw = rows_zw[r][PAD:PAD + W]
        zbit = jnp.where((zw & 16384) != 0, 1, 0)
        wbit = jnp.where((zw & 32768) != 0, 1, 0)
        code = (r * W + ii) * 4 + zbit * 2 + wbit
        cand = jnp.where(rows_a[r] > 0.5, code, BIG_PICK)
        pick = cand if pick is None else jnp.minimum(pick, cand)
    pick = jnp.min(pick, axis=0, keepdims=True)         # [1, BB]
    found = pick < BIG_PICK
    # int32 0/1 bits (Mosaic cannot lower i8->i1 truncations of selects)
    stem0_z = jnp.where(found, (pick // 2) % 2, 1)
    stem0_w = jnp.where(found, pick % 2, 0)

    # ---- helix/wobble admission -----------------------------------------
    prev_z = _srk(mt_s[0], 1, 1.0) > 0.5
    prev_w = _srk(mt_s[1], 1, 0.0) > 0.5
    gate = prev_z | (w0 & prev_w)
    i_lane = ii
    j_lane = L - i_lane
    cellmask = (active_r & (i_lane >= 1) & (i_lane <= L - 1)
                & (i_lane <= maxq) & (j_lane <= maxd))
    adm_new = cellmask & nz0 & ~(gate & badr)

    # ---- running-min combo scan (reference stems-list order) -------------
    au_f = jnp.where(au0, TAU, f32(0.0))
    base_pk = i_lane * max_ext + L
    z32 = f32(0.0)

    def shv(row, sh):
        return row[PAD - sh: PAD - sh + W]

    spec_rows = {(0, 0): stk00_r, (1, 0): stk10_r, (0, 1): stk01_r,
                 (1, 1): v11_r, (1, 2): v12_r, (2, 1): v21_r,
                 (2, 2): v22_r}
    cms = {s: f32(intloop_c[s]) + ms for s in range(2, dropout + 1)}
    bau = {s: f32(bulge_c[s]) + au_f for s in range(2, dropout + 1)}
    cands = []
    for (s, u1) in combos:
        u2 = s - u1
        r = dropout - s
        sh = u1 + 1
        ph_sh = shv(rows_h[r], sh)
        if s >= 2 and u1 >= 1 and u2 >= 1 and \
                (u1, u2) not in ((1, 1), (1, 2), (2, 1), (2, 2)):
            raw = cms[s] + shv(rows_vm[r], sh)
            Et = raw / f32(100.0) + ph_sh
        elif s >= 2 and (u1 == 0 or u2 == 0):
            au_p = jnp.where(shv(rows_au[r], sh) > 0.5, TAU, z32)
            Et = (bau[s] + au_p) / f32(100.0) + ph_sh
        else:
            Et = spec_rows[(u1, u2)][0] + ph_sh
        pay = (shv(rows_zw[r], sh)
               + (base_pk - ((u1 + 1) * ME1 + u2 + 1)))
        cands.append((Et, pay))

    # tournament with LEFT priority on ties (first-occurrence tie-break)
    while len(cands) > 1:
        nxt = []
        for c2 in range(0, len(cands) - 1, 2):
            (ea, pa), (eb, pb) = cands[c2], cands[c2 + 1]
            left = ea <= eb
            nxt.append((jnp.where(left, ea, eb), jnp.where(left, pa, pb)))
        if len(cands) % 2:
            nxt.append(cands[-1])
        cands = nxt
    run_min, run_pay = cands[0]
    run_pay = jnp.where(jnp.isinf(run_min), 0, run_pay)

    hyb = run_min
    nopred = jnp.isinf(hyb)
    pay = jnp.maximum(run_pay, 0)
    pk = pay % 16384
    mtz_c = jnp.where(nopred, stem0_z, (pay // 16384) % 2)
    mtw_c = jnp.where(nopred, stem0_w, (pay // 32768) % 2)
    packed = jnp.where(nopred, 0, pk)

    hyb_row = jnp.where(adm_new, hyb, INF)
    pr_row = jnp.where(adm_new, packed, -1)
    mtz_row = jnp.where(adm_new, mtz_c, 1)
    mtw_row = jnp.where(adm_new, mtw_c, 0)

    # ---- running minimum over the diagonal -------------------------------
    inter = jnp.where(adm_new, extq_i + extdb_j + hyb, INF)
    dmin = jnp.min(inter, axis=0, keepdims=True)
    darg = jnp.min(jnp.where(inter == dmin, i_lane, BIG_PICK),
                   axis=0, keepdims=True)
    improve = active_r & (dmin < min_e)
    one = (i_lane == darg).astype(f32)                  # exactly one row
    take_q = jnp.sum(one * extq_i, axis=0, keepdims=True)
    take_d = jnp.sum(one * extdb_j, axis=0, keepdims=True)
    acc0 = pf_r[2:3]
    acc_new = acc0 + take_q + take_d

    stf[0] = jnp.where(improve, dmin, min_e)[0]
    stf[1] = jnp.where(improve, acc_new, min_a)[0]
    sti[1] = jnp.where(improve, darg, min_i)[0]
    sti[2] = jnp.where(improve, L - darg, min_j)[0]
    new_min_len = jnp.where(improve, L, min_len)
    sti[3] = new_min_len[0]

    # ---- termination -----------------------------------------------------
    stop = (L - new_min_len >= dropout) | ((L > maxq) & (L > maxd))
    sti[4] = ((ovf > 0) | (active_r & ~stop & (L >= max_ext)))[0] \
        .astype(jnp.int32)
    sti[0] = (active_r & ~stop & (L < max_ext))[0].astype(jnp.int32)

    # ---- state/ring updates ----------------------------------------------
    mt_s[0] = mt_s[2]
    mt_s[1] = mt_s[3]
    mt_s[2] = mtz_row.astype(f32)
    mt_s[3] = mtw_row.astype(f32)
    ring_h[pl.ds(phi(L), 1), pl.ds(PAD, W)] = hyb_row[None]
    ring_a[pl.ds(phi(L), 1)] = adm_new.astype(f32)[None]

    # ---- outputs ---------------------------------------------------------
    pred_o[0] = pr_row
    ints_o[0] = sti[1]
    ints_o[1] = sti[2]
    ints_o[2] = sti[3]
    ints_o[3] = sti[4]
    floats_o[0] = stf[0]
    floats_o[1] = stf[1]


def pallas_sweep(P, extq_i, EXTD, maxq, maxd, origin_hyb, o_adm,
                 mtz0, mtw0, pf, *, W: int, dropout: int, max_ext: int,
                 combos, intloop_c, bulge_c, tau: float, interpret: bool):
    """Run the per-diagonal sweep. P: plane dict ([DD, W|PW, B]); EXTD:
    [max_ext, W, B] sheared extdb rows; pf: [8, B] f32 with rows 0..2 =
    (valid, energy0, acc0). Returns (pred [max_ext, W, B] i32,
    ints [8, B] i32 rows 0..3 = min_i/min_j/min_len/ovf,
    floats [8, B] f32 rows 0..1 = min_e/min_a)."""
    B = pf.shape[1]
    BB = min(B, 512 if W <= 32 else 256)
    nb = B // BB
    OFF = dropout + 2
    PW = W + OFF
    RH = dropout + 2
    f32 = jnp.float32

    def row_at(shape1, off):
        return pl.BlockSpec((1, shape1, BB),
                            lambda b, l, off=off: (l + off, 0, b))

    def const2(rows):
        return pl.BlockSpec((rows, BB), lambda b, l: (0, b))

    def cur(name):
        return row_at(P[name].shape[1], OFF + 1)

    def prev(name):
        return row_at(P[name].shape[1], OFF)

    in_specs = [
        cur("MS"), cur("STK00"), cur("STK10"), cur("STK01"),
        cur("V11"), cur("V12"), cur("V21"), cur("V22"),
        cur("NZ0"), cur("W0"), cur("AU0"), cur("BAD"),
        prev("VM"), prev("ZW"), prev("AU0"),
        pl.BlockSpec((1, W, BB), lambda b, l: (l, 0, b)),   # EXTD
        const2(W),                                          # extq_i
        const2(8), const2(8),                               # maxq, maxd
        const2(PW),                                         # origin_hyb
        const2(W),                                          # o_adm
        const2(W), const2(W),                               # mtz0, mtw0
        const2(8),                                          # pf
    ]
    out_shapes = (
        jax.ShapeDtypeStruct((max_ext, W, B), jnp.int32),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
        jax.ShapeDtypeStruct((8, B), f32),
    )
    out_specs = (
        pl.BlockSpec((1, W, BB), lambda b, l: (l, 0, b)),
        pl.BlockSpec((8, BB), lambda b, l: (0, b)),
        pl.BlockSpec((8, BB), lambda b, l: (0, b)),
    )
    scratch = [
        pltpu.VMEM((RH, PW, BB), f32),        # ring_h
        pltpu.VMEM((RH, W, BB), f32),         # ring_a
        pltpu.VMEM((RH, PW, BB), f32),        # ring_vm
        pltpu.VMEM((RH, PW, BB), jnp.int32),  # ring_zw
        pltpu.VMEM((RH, PW, BB), f32),        # ring_au
        pltpu.VMEM((4, W, BB), f32),          # mt state
        pltpu.VMEM((8, BB), jnp.int32),       # sti
        pltpu.VMEM((8, BB), f32),             # stf
    ]

    kern = functools.partial(
        _sweep_kernel, W=W, dropout=dropout, BB=BB, max_ext=max_ext,
        combos=tuple(combos), intloop_c=tuple(intloop_c),
        bulge_c=tuple(bulge_c), tau=tau)

    def pad8(a):
        return jnp.broadcast_to(a.astype(jnp.int32)[None, :], (8, B))

    operands = (
        P["MS"], P["STK00"], P["STK10"], P["STK01"], P["V11"], P["V12"],
        P["V21"], P["V22"],
        P["NZ0"].astype(f32), P["W0"].astype(f32), P["AU0"].astype(f32),
        P["BAD"].astype(f32),
        P["VM"], P["ZW"], P["AU0"].astype(f32),
        EXTD, extq_i, pad8(maxq), pad8(maxd), origin_hyb,
        o_adm.astype(f32), mtz0.astype(f32), mtw0.astype(f32), pf,
    )
    return pl.pallas_call(
        kern,
        grid=(nb, max_ext),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)
