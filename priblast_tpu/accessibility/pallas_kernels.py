"""Fused Pallas TPU kernels for the accessibility DP scans.

The XLA lax.scan formulation (accessibility/batched.py) issues hundreds of
small [B, band] ops per sequence column; on TPU those are dominated by
per-op overhead and HBM round-trips. These kernels fuse an entire pass into
one Pallas program per batch block: all DP state lives in VMEM scratch, the
precomputed weight grids stream in through the BlockSpec pipeline, and each
column is ~a few hundred VPU ops on resident [BS, band] tiles plus two
small MXU dots.

Layout: batch block BS on the sublane axis, the span band on the lane axis.
Grid = (B/BS, N_pad/CB); scratch persists across the column-block axis
(sequential innermost grid dimension) and is reset at the first block.

Numerical semantics are identical to accessibility/batched.py (same grids,
same recurrences); outputs validated elementwise against it in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from priblast_tpu.accessibility import batched as bt
from priblast_tpu.utils import thermo

ML = thermo.MAXLOOP

BS = 8     # sequences per program (sublane block)
CB = 16    # columns per grid step


def _shift(x, r):
    """out[..., d] = x[..., d - r] with zero fill (lane axis)."""
    if r == 0:
        return x
    band = x.shape[-1]
    rolled = jnp.roll(x, r, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if r > 0:
        return jnp.where(lane >= r, rolled, 0.0)
    return jnp.where(lane < band + r, rolled, 0.0)


def _inside_kernel(n_cols: int, band: int, consts: dict):
    W = band - 2
    sig2 = consts["sig2"]
    sig1 = consts["sig1"]
    w_mli = consts["w_mli"]
    w_mlb = consts["w_mlb"]
    w_mlc = consts["w_mlc"]

    def kernel(stackw_r, t1nz_r, mismin_r, auin_r, dangle_r, validc_r, hpw_r,
               mismout_r, auout_r, mlclose_r, sp10_r, sp01_r, sp11_r, sp12_r,
               sp21_r, sp22_r, extdot_r, k2_r, kb_r, lmat_r, kbmat_r,
               # outputs
               stem_o, stemm_o, stema_o, multi_o, multi1_o, multi2_o,
               # scratch
               prev_s, smw_s, saw_s, m1w_s, awin_s):
        jc = pl.program_id(1)

        @pl.when(jc == 0)
        def _():
            prev_s[...] = jnp.zeros_like(prev_s)
            smw_s[...] = jnp.zeros_like(smw_s)
            saw_s[...] = jnp.zeros_like(saw_s)
            m1w_s[...] = jnp.zeros_like(m1w_s)
            awin_s[...] = jnp.zeros_like(awin_s)

        def col(k, _):
            stem_prev = prev_s[0]
            stemend_prev = prev_s[1]
            multi2_prev = prev_s[2]
            stem_prev2 = prev_s[3]

            stackW = stackw_r[:, k, :]
            t1_nz = t1nz_r[:, k, :]
            inner = _shift(stem_prev, 2) * stackW + _shift(stemend_prev, 2)
            stem = jnp.where(t1_nz != 0, inner * sig2, 0.0)
            stem_m = stem * mismin_r[:, k, :]
            stem_a = stem * auin_r[:, k, :]

            multi2 = (jnp.where(t1_nz != 0,
                                stem * w_mli * dangle_r[:, k, :], 0.0)
                      + _shift(multi2_prev, 1) * (w_mlb * sig1))

            # multibif: sum_u m1w[u-1][d-u] * multi2[:, u]
            mb = jnp.zeros_like(stem)
            for u in range(1, W + 1):
                m2u = multi2[:, u][:, None]
                mb = mb + _shift(m1w_s[u - 1], u) * m2u
            multi1 = multi2 + mb

            # multi: triangular decay matmul
            multi = jax.lax.dot_general(
                mb, lmat_r[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            # stemend
            # general interior: G[r] = sum_u K2[r,u] * smw[u]  (MXU)
            smw_now = jnp.concatenate([stem_m[None], smw_s[: ML]], axis=0)
            saw_now = jnp.concatenate([stem_a[None], saw_s[: ML]], axis=0)
            # G[r, b, d] = sum_u K2[r, u] smw[u, b, d]: Mosaic wants 2D
            # matmuls, so contract per sequence (BS small 2D dots)
            G = jnp.stack([
                jax.lax.dot_general(k2_r[...], smw_now[:, b, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for b in range(BS)], axis=1)
            gen = jnp.zeros_like(stem)
            for r in range(2, ML + 1):
                gen = gen + _shift(G[r], r)
            se = hpw_r[:, k, :] + gen * mismout_r[:, k, :]

            bul = jax.lax.dot_general(
                stem_a, kbmat_r[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for u in range(2, ML + 1):
                bul = bul + _shift(saw_now[u], u) * kb_r[0, u]
            se = se + bul * auout_r[:, k, :]

            se = se + sp10_r[:, k, :] * _shift(stem, 1)
            se = se + sp01_r[:, k, :] * _shift(stem_prev, 1)
            se = se + sp11_r[:, k, :] * _shift(stem_prev, 2)
            se = se + sp21_r[:, k, :] * _shift(stem_prev, 3)
            se = se + sp12_r[:, k, :] * _shift(stem_prev2, 3)
            se = se + sp22_r[:, k, :] * _shift(stem_prev2, 4)
            se = se + multi * mlclose_r[:, k, :]
            stemend = jnp.where(validc_r[:, k, :] != 0, se, 0.0)

            # exterior log-scan
            a_prev = awin_s[0, :, band - 1][:, None]  # A[j-1] parked in lane band-1
            awin = awin_s[0, :, : band - 1]           # A[j-1-t], t=0..band-2
            expd = jnp.exp(awin - a_prev)
            dot = jnp.sum(stem[:, 1:] * extdot_r[:, k, 1:] * expd, axis=1,
                          keepdims=True)
            a_cur = a_prev + jnp.log1p(dot)

            # write outputs; A rides in lane 0 of multi (span 0 is
            # structurally zero), avoiding an unaligned single-lane store
            lane0 = jax.lax.broadcasted_iota(jnp.int32, multi.shape, 1) == 0
            stem_o[:, k, :] = stem
            stemm_o[:, k, :] = stem_m
            stema_o[:, k, :] = stem_a
            multi_o[:, k, :] = jnp.where(lane0, a_cur, multi)
            multi1_o[:, k, :] = multi1
            multi2_o[:, k, :] = multi2

            # update scratch
            prev_s[0] = stem
            prev_s[1] = stemend
            prev_s[2] = multi2
            prev_s[3] = stem_prev
            smw_s[...] = smw_now[: ML + 1]
            saw_s[...] = saw_now[: ML + 1]
            m1w_s[...] = jnp.concatenate([multi1[None], m1w_s[: W]], axis=0)
            new_awin = jnp.concatenate(
                [a_cur, awin[:, : band - 2], a_cur], axis=1)
            awin_s[0] = new_awin
            return 0

        jax.lax.fori_loop(0, n_cols, col, 0, unroll=False)

    return kernel


def inside_pass_pallas(n_max: int, band: int, dtype_name: str, grids, tables):
    """Pallas version of batched.inside_pass. grids: the Grids namedtuple
    with arrays [N+1, B, band]; returns the same stacked outputs."""
    t = tables
    B = grids.stackW.shape[1]
    n_cols = n_max + 1
    n_pad = ((n_cols + CB - 1) // CB) * CB
    b_pad = ((B + BS - 1) // BS) * BS

    def prep(x):
        # [N+1, B, band] -> [B_pad, N_pad, band] f32
        x = jnp.asarray(x, jnp.float32)
        x = jnp.pad(x, ((0, n_pad - n_cols), (0, b_pad - B)) +
                    ((0, 0),) * (x.ndim - 2))
        return jnp.transpose(x, (1, 0, 2)) if x.ndim == 3 else x.T

    ins = [prep(x) for x in grids]

    consts = dict(
        sig2=float(np.exp(-2 * t.lsig)), sig1=float(np.exp(-t.lsig)),
        w_mli=float(t.W_mli), w_mlb=float(t.W_mlb), w_mlc=float(t.W_mlc),
    )

    kb_row = jnp.asarray(np.asarray(bt._linmodel(band - 2).K_bulge),
                         jnp.float32)[None, :]  # [1, ML+1]

    grid = (b_pad // BS, n_pad // CB)

    def gspec():
        return pl.BlockSpec((BS, CB, band), lambda ib, jc: (ib, jc, 0),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda ib, jc: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = [gspec() for _ in range(17)] + [
        cspec((ML + 1, ML + 1)),            # K2
        cspec((1, ML + 1)),                 # Kb row
        cspec((band, band)),                # Lmat
        cspec((band, band)),                # KbMat
    ]
    out_specs = [gspec() for _ in range(6)]

    out_shape = [jax.ShapeDtypeStruct((b_pad, n_pad, band), jnp.float32)
                 for _ in range(6)]

    scratch = [
        pltpu.VMEM((4, BS, band), jnp.float32),        # prev states
        pltpu.VMEM((ML + 1, BS, band), jnp.float32),   # smw
        pltpu.VMEM((ML + 1, BS, band), jnp.float32),   # saw
        pltpu.VMEM((band - 1, BS, band), jnp.float32), # m1w (W+1 slots)
        pltpu.VMEM((1, BS, band), jnp.float32),        # awin (+ A[j-1] slot)
    ]

    kernel = _inside_kernel(CB, band, consts)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=bool(int(__import__("os").environ.get(
            "PRIBLAST_PALLAS_INTERPRET", "0"))),
    )(*ins, jnp.asarray(t.K2, jnp.float32), kb_row,
      jnp.asarray(t.Lmat, jnp.float32), jnp.asarray(t.KbMat, jnp.float32))

    def unprep(x):
        x = jnp.transpose(x, (1, 0, 2)) if x.ndim == 3 else x.T
        return x[:n_cols, :B]

    stem, stem_m, stem_a, multi_pk, multi1, multi2 = (unprep(o) for o in outs)
    A = multi_pk[..., 0]
    lane = jnp.arange(band)[None, None, :]
    multi = jnp.where(lane == 0, 0.0, multi_pk)
    return stem, stem_m, stem_a, multi, multi1, multi2, A


# ---------------------------------------------------------------------------
# Outside pass. The kernel walks columns in DESCENDING q; all inputs are
# provided column-reversed so the grid still iterates forward. The multi1
# diagonal window (alpha data from columns q-1..q-W-1, i.e. *ahead* in
# reversed order) streams in as two adjacent blocks of the reversed
# diag-view array.
# ---------------------------------------------------------------------------

CBO = 72  # columns per grid step (>= band-1 so two blocks cover the window)


def _outside_kernel(band: int, consts: dict):
    W = band - 2
    sig2 = consts["sig2"]
    sig1 = consts["sig1"]
    w_mli = consts["w_mli"]
    decay = consts["w_mlb"] * consts["sig1"]

    def kernel(t2nz_r, seed_r, dangle_r, bsemw_r, bseaw_r, mismout2_r,
               auout2_r, contw_r, mlcloseo_r, spo10_r, spo01_r, spo11_r,
               spo12_r, spo21_r, spo22_r, m2diag_r, validint_r,
               m1d0_r, m1d1_r,
               k2_r, kb_r, lmatu_r, kbmatu_r,
               bse_o, bsem_o, bsea_o, bmulti_o, bmulti2_o,
               prev_s, bsew_s, bsaw_s, bseraw_s, bmbw_s, m1win_s):
        jc = pl.program_id(1)

        @pl.when(jc == 0)
        def _():
            prev_s[...] = jnp.zeros_like(prev_s)
            bsew_s[...] = jnp.zeros_like(bsew_s)
            bsaw_s[...] = jnp.zeros_like(bsaw_s)
            bseraw_s[...] = jnp.zeros_like(bseraw_s)
            bmbw_s[...] = jnp.zeros_like(bmbw_s)

        lane = jax.lax.broadcasted_iota(jnp.int32, (BS, band), 1)
        dmask = (lane < W).astype(jnp.float32)
        wmask = (lane <= W).astype(jnp.float32)  # zero span W+1
        # the multi1 diagonal window for this block (scratch so the column
        # loop can index it dynamically): [BS, 2*band, band]
        m1win_s[:, : band, :] = m1d0_r[...]
        m1win_s[:, band :, :] = m1d1_r[...]

        def col(k, _):
            bstem_next = prev_s[0]
            bm2_next = prev_s[1]
            valid = validint_r[:, k, :]

            bse = _shift(bstem_next, -2) * sig2 * dmask * valid
            bse_m = bse * bsemw_r[:, k, :]
            bse_a = bse * bseaw_r[:, k, :]

            clos = bse * mlcloseo_r[:, k, :]
            bmulti = jax.lax.dot_general(
                clos, lmatu_r[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * valid

            # bm1[d] = sum_t bmbw[t-1][d+t] * m2diag[:, k, t]
            m2col = m2diag_r[:, k, :]
            bm1 = jnp.zeros_like(bse)
            for tt in range(1, W + 1):
                bm1 = bm1 + _shift(bmbw_s[tt - 1], -tt) * m2col[:, tt][:, None]
            bm1 = bm1 * valid
            bmb = (bm1 + bmulti) * wmask  # window copy bound: span <= W

            # bm2[d] = bm1 + decayed + sum_e bmb[e] * multi1[q-d][e-d]
            #        = ... + sum_e bmb[e] * D_m1[q-e][e-d]
            bm2 = bm1 + _shift(bm2_next, -1) * decay
            # m1win is streamed lane-REVERSED (Mosaic has no rev op):
            # f[d] = D_m1[q-e][band-1-d]
            for e in range(1, W + 1):
                f = m1win_s[:, k + e, :]
                bm2 = bm2 + bmb[:, e][:, None] * _shift(f, e + 1 - band)
            bm2 = bm2 * valid

            # b_stem
            out = seed_r[:, k, :] * dangle_r[:, k, :]
            bsew_now = jnp.concatenate([bse_m[None], bsew_s[: ML]], axis=0)
            bsaw_now = jnp.concatenate([bse_a[None], bsaw_s[: ML]], axis=0)
            Gp = jnp.stack([
                jax.lax.dot_general(k2_r[...], bsew_now[:, b, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for b in range(BS)], axis=1)
            gen = jnp.zeros_like(bse)
            for r in range(2, ML + 1):
                gen = gen + _shift(Gp[r], -r)
            out = out + gen * mismout2_r[:, k, :]

            bul = jax.lax.dot_general(
                bse_a, kbmatu_r[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for u in range(2, ML + 1):
                bul = bul + _shift(bsaw_now[u], -u) * kb_r[0, u]
            out = out + bul * auout2_r[:, k, :]

            bse_q1 = bseraw_s[0]
            bse_q2 = bseraw_s[1]
            out = out + spo10_r[:, k, :] * _shift(bse, -1)
            out = out + spo01_r[:, k, :] * _shift(bse_q1, -1)
            out = out + spo11_r[:, k, :] * _shift(bse_q1, -2)
            out = out + spo21_r[:, k, :] * _shift(bse_q1, -3)
            out = out + spo12_r[:, k, :] * _shift(bse_q2, -3)
            out = out + spo22_r[:, k, :] * _shift(bse_q2, -4)

            out = out + _shift(bstem_next, -2) * contw_r[:, k, :]
            out = out + bm2 * w_mli * dangle_r[:, k, :]
            bstem = jnp.where(t2nz_r[:, k, :] != 0, out, 0.0)

            bse_o[:, k, :] = bse
            bsem_o[:, k, :] = bse_m
            bsea_o[:, k, :] = bse_a
            bmulti_o[:, k, :] = bmulti
            bmulti2_o[:, k, :] = bm2

            prev_s[0] = bstem
            prev_s[1] = bm2
            bsew_s[...] = bsew_now[: ML + 1]
            bsaw_s[...] = bsaw_now[: ML + 1]
            bseraw_s[...] = jnp.concatenate([bse[None], bseraw_s[:2]], axis=0)
            bmbw_s[...] = jnp.concatenate([bmb[None], bmbw_s[: W]], axis=0)
            return 0

        jax.lax.fori_loop(0, band, col, 0)

    return kernel


def outside_pass_pallas(n_max: int, band: int, og, multi1_full, tables):
    """Pallas version of batched.outside_pass. og: OutsideGrids
    ([N+1, B, band]); multi1_full: inside multi1 output. Returns
    (bse, bse_m, bse_a, b_multi, b_multi2) stacked [N+1, B, band]."""
    t = tables
    B = og.seed.shape[1]
    n_cols = n_max + 1
    cbo = band  # block length must equal band for the diag-window alignment
    n_pad = ((n_cols + cbo - 1) // cbo) * cbo
    b_pad = ((B + BS - 1) // BS) * BS

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        x = jnp.pad(x, ((0, n_pad - n_cols), (0, b_pad - B), (0, 0)))
        return jnp.transpose(x[::-1], (1, 0, 2))  # reversed columns

    ins = [prep(x) for x in og]

    # multi1 diagonal view D[i, b, f] = multi1[i+f, b, f], front-padded by
    # `band` zero rows so negative left-ends (i = q-e < 0 but col q-d >= 0)
    # keep their entries, then reversed. Col q-e lands at reversed position
    # r+e for r = n_pad-1-q, and the padded array is exactly one CBO block
    # longer (band == CBO), so blocks jc and jc+1 cover the window.
    m1p = jnp.pad(jnp.asarray(multi1_full, jnp.float32),
                  ((band, 0), (0, 0), (0, 0)))
    d_m1 = bt._diag_view(m1p, band)
    d_m1 = jnp.pad(d_m1,
                   ((0, (n_pad + cbo) - d_m1.shape[0]), (0, b_pad - B),
                    (0, 0)))
    d_m1r = jnp.transpose(d_m1[::-1], (1, 0, 2))[:, :, ::-1]  # lane-flip

    consts = dict(
        sig2=float(np.exp(-2 * t.lsig)), sig1=float(np.exp(-t.lsig)),
        w_mli=float(t.W_mli), w_mlb=float(t.W_mlb),
    )
    lm = bt._linmodel(band - 2)
    kb_row = jnp.asarray(lm.K_bulge, jnp.float32)[None, :]
    tt_ = np.arange(band)
    LmatU = np.where(tt_[:, None] >= tt_[None, :],
                     float(t.W_mlb * np.exp(-t.lsig)) **
                     np.maximum(tt_[:, None] - tt_[None, :], 0), 0.0)
    diff = tt_[:, None] - tt_[None, :]
    KbMatU = np.where((diff >= 2) & (diff <= ML),
                      lm.K_bulge[np.clip(diff, 0, ML)], 0.0)

    grid = (b_pad // BS, n_pad // cbo)
    nblk = n_pad // cbo

    def gspec():
        return pl.BlockSpec((BS, cbo, band), lambda ib, jc: (ib, jc, 0),
                            memory_space=pltpu.VMEM)

    def gspec_next():
        # blocks of the (one-block-longer) diag array
        return pl.BlockSpec((BS, cbo, band), lambda ib, jc: (ib, jc + 1, 0),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda ib, jc: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = [gspec() for _ in range(17)] + [gspec(), gspec_next()] + [
        cspec((ML + 1, ML + 1)), cspec((1, ML + 1)),
        cspec((band, band)), cspec((band, band))]
    out_specs = [gspec() for _ in range(5)]
    out_shape = [jax.ShapeDtypeStruct((b_pad, n_pad, band), jnp.float32)
                 for _ in range(5)]
    scratch = [
        pltpu.VMEM((2, BS, band), jnp.float32),
        pltpu.VMEM((ML + 1, BS, band), jnp.float32),
        pltpu.VMEM((ML + 1, BS, band), jnp.float32),
        pltpu.VMEM((3, BS, band), jnp.float32),
        pltpu.VMEM((band - 1, BS, band), jnp.float32),
        pltpu.VMEM((BS, 2 * band, band), jnp.float32),
    ]

    kernel = _outside_kernel(band, consts)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=bool(int(__import__("os").environ.get(
            "PRIBLAST_PALLAS_INTERPRET", "0"))),
    )(*ins, d_m1r, d_m1r,
      jnp.asarray(t.K2, jnp.float32), kb_row,
      jnp.asarray(LmatU, jnp.float32), jnp.asarray(KbMatU, jnp.float32))

    def unprep(x):
        x = jnp.transpose(x, (1, 0, 2))[::-1]
        return x[:n_cols, :B]

    return tuple(unprep(o) for o in outs)


def _bscan_kernel(band: int):
    def kernel(sd_r, bl_o, bwin_s):
        jc = pl.program_id(1)

        @pl.when(jc == 0)
        def _():
            bwin_s[...] = jnp.zeros_like(bwin_s)

        def col(k, _):
            bwin = bwin_s[0]  # bwin[:, t] = B[i+1+t]
            b_next = bwin[:, 0:1]
            expd = jnp.exp(bwin - b_next)
            dot = jnp.sum(sd_r[:, k, 1:] * expd[:, : band - 1], axis=1,
                          keepdims=True)
            b_cur = b_next + jnp.log1p(dot)
            lane0 = jax.lax.broadcasted_iota(
                jnp.int32, (BS, band), 1) == 0
            bl_o[:, k, :] = jnp.where(lane0, b_cur, 0.0)
            bwin_s[0] = jnp.concatenate([b_cur, bwin[:, : band - 1]], axis=1)
            return 0

        jax.lax.fori_loop(0, band, col, 0)

    return kernel


def b_outer_scan_pallas(stem_full, ext_dot_full, n_max: int, band: int,
                        lengths):
    """Pallas version of batched.b_outer_scan (backward log scan)."""
    B = stem_full.shape[1]
    n_cols = n_max + 1
    cbo = band
    n_pad = ((n_cols + cbo - 1) // cbo) * cbo
    b_pad = ((B + BS - 1) // BS) * BS

    sd = bt._diag_view(jnp.asarray(stem_full, jnp.float32) *
                       jnp.asarray(ext_dot_full, jnp.float32), band)
    sd = jnp.pad(sd, ((0, n_pad - n_cols), (0, b_pad - B), (0, 0)))
    sdr = jnp.transpose(sd[::-1], (1, 0, 2))

    grid = (b_pad // BS, n_pad // cbo)
    outs = pl.pallas_call(
        _bscan_kernel(band),
        grid=grid,
        in_specs=[pl.BlockSpec((BS, cbo, band), lambda ib, jc: (ib, jc, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BS, cbo, band), lambda ib, jc: (ib, jc, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, band), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, BS, band), jnp.float32)],
        interpret=bool(int(__import__("os").environ.get(
            "PRIBLAST_PALLAS_INTERPRET", "0"))),
    )(sdr)

    bl = jnp.transpose(outs[..., 0], (1, 0))[::-1][:n_cols, :B]
    offs = jnp.take_along_axis(bl, lengths[None, :], axis=0)
    return bl - offs
