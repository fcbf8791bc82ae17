"""Batched TPU accessibility engine (JAX).

Computes per-window accessibilities for a *batch* of padded sequences with
the linear-domain scaled formulation derived in
:mod:`priblast_tpu.accessibility.linear_ref` (see its docstring for the
math and the mapping to the reference recurrences in src/raccess.cpp).

Design (TPU-first):

- one `lax.scan` per pass over sequence columns; the carry holds only small
  rolling windows (O(B * W * W)), per-column state is emitted through the
  scan's stacked outputs, and all sequence/pair-type dependent weights are
  precomputed as `[N, B, band]` grids consumed as scan inputs — the scan
  body is pure arithmetic (VPU) plus small matmuls (MXU);
- the O(MAXLOOP^2) interior-loop sum per column is an einsum against a
  fixed 31x31 kernel followed by 31 static shifted adds;
- the multiloop span accumulation is a triangular [band x band] matmul;
- probability passes are fully vectorized over the whole grid (no scan);
- everything is batched over sequences; padding columns are neutralized by
  clamped gathers into zero-padded sequences (pair type 0 => weight 0).

f32 by default (validated ~1e-3 kcal/mol against the exact engine for
W <= 80); pass dtype=float64 on CPU for ~1e-9 agreement with linear_ref.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from priblast_tpu.accessibility.linear_ref import LinearModel
from priblast_tpu.utils import thermo

TURN = thermo.TURN
ML = thermo.MAXLOOP


@functools.lru_cache(maxsize=8)
def _linmodel(w_span: int, log_sigma: float = 1.0) -> LinearModel:
    return LinearModel(w_span, log_sigma)


class Tables(NamedTuple):
    """Device-resident constant tables."""
    bp: jax.Array          # (5,5) int32
    rtype: jax.Array       # (7,) int32
    W_stack: jax.Array     # (7,7)
    W_int11: jax.Array
    W_int21: jax.Array
    W_int22: jax.Array
    W_mism_i: jax.Array
    W_mism_h: jax.Array
    W_d5: jax.Array
    W_d3: jax.Array
    W_au: jax.Array        # (7,)
    W_hairpin_len: jax.Array
    W_bulge_len: jax.Array
    K2: jax.Array          # (ML+1, ML+1): K2[r, u2] = K_int[r-u2, u2]
    Kb: jax.Array          # (ML+1,) bulge kernel (u >= 2)
    Lmat: jax.Array        # (band, band) triangular decay matmul for multi
    KbMat: jax.Array       # (band, band) banded bulge conv matmul
    sig_pow: jax.Array
    inv_sig_pow: jax.Array
    W_mlb: float
    W_mli: float
    W_mlc: float
    lsig: float
    kT: float


def make_tables(w_span: int, dtype=jnp.float32, log_sigma: float = 1.0) -> Tables:
    m = _linmodel(w_span, log_sigma)
    band = w_span + 2
    f = lambda x: jnp.asarray(x, dtype=dtype)

    K2 = np.zeros((ML + 1, ML + 1))
    for r in range(ML + 1):
        for u2 in range(ML + 1):
            if 0 <= r - u2 <= ML:
                K2[r, u2] = m.K_int[r - u2, u2]

    decay = float(m.W_mlb * np.exp(-m.lsig))
    t_idx = np.arange(band)
    Lmat = np.where(t_idx[:, None] <= t_idx[None, :],
                    decay ** np.maximum(t_idx[None, :] - t_idx[:, None], 0), 0.0)
    # KbMat[d', d] = Kb[d - d'] : bulge conv over the current column
    diff = t_idx[None, :] - t_idx[:, None]
    KbMat = np.where((diff >= 2) & (diff <= ML),
                     m.K_bulge[np.clip(diff, 0, ML)], 0.0)

    return Tables(
        bp=jnp.asarray(m.bp), rtype=jnp.asarray(m.rtype),
        W_stack=f(m.W_stack), W_int11=f(m.W_int11), W_int21=f(m.W_int21),
        W_int22=f(m.W_int22), W_mism_i=f(m.W_mism_i), W_mism_h=f(m.W_mism_h),
        W_d5=f(m.W_dangle5), W_d3=f(m.W_dangle3), W_au=f(m.W_au),
        W_hairpin_len=f(m.W_hairpin_len), W_bulge_len=f(m.W_bulge_len),
        K2=f(K2), Kb=f(m.K_bulge), Lmat=f(Lmat), KbMat=f(KbMat),
        sig_pow=f(m.sig_pow), inv_sig_pow=f(m.inv_sig_pow),
        W_mlb=float(m.W_mlb), W_mli=float(m.W_mli), W_mlc=float(m.W_mlc),
        lsig=float(m.lsig), kT=float(m.sp.kT),
    )


def _shift_d(x: jax.Array, r: int) -> jax.Array:
    """shift along the last (span) axis: out[..., d] = x[..., d - r]
    (negative r reads larger spans); zero fill."""
    if r == 0:
        return x
    if r > 0:
        pad = [(0, 0)] * (x.ndim - 1) + [(r, 0)]
        return jnp.pad(x, pad)[..., : x.shape[-1]]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, -r)]
    return jnp.pad(x, pad)[..., -r:]



def _skew_fwd(x: jax.Array) -> jax.Array:
    """[B, U, D] -> out[b, u, d] = x[b, u, d - u] (zero fill), via the
    pad+reshape skew trick (pure layout ops — no per-u shifts)."""
    B, U, D = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, U)))
    flat = xp.reshape(B, U * (D + U))
    out = flat[:, : U * (D + U - 1)].reshape(B, U, D + U - 1)
    return out[:, :, :D]


def _skew_rev(x: jax.Array) -> jax.Array:
    """[B, U, D] -> out[b, u, d] = x[b, u, d + u] (zero fill)."""
    U = x.shape[1]
    D = x.shape[2]
    y = x[:, ::-1, :]
    yp = jnp.pad(y, ((0, 0), (0, 0), (0, U)))
    flat = yp.reshape(x.shape[0], U * (D + U))
    z = flat[:, : U * (D + U - 1)].reshape(x.shape[0], U, D + U - 1)
    return z[:, ::-1, U - 1 : U - 1 + D]


class Grids(NamedTuple):
    """Per-column weight grids, all [N+1, B, band] (leading axis = column j,
    consumed by lax.scan)."""
    stackW: jax.Array     # stem stack/stemend transition weight
    t1_nz: jax.Array      # bool: pair (i+1, j) exists
    mism_in: jax.Array    # prefold for stem as inner helix
    au_in: jax.Array
    dangle_ij: jax.Array  # exterior/multi2 dangle for pair (i+1, j)
    validC: jax.Array     # bool: closing pair (i, j+1) exists (and j != n)
    hpW: jax.Array        # hairpin weight * sigma^-d
    mism_out: jax.Array   # closing-side mismatch factor
    au_out: jax.Array
    mlclose: jax.Array    # multi closing weight
    sp10: jax.Array       # special small-loop weights (see linear_ref)
    sp01: jax.Array
    sp11: jax.Array
    sp12: jax.Array
    sp21: jax.Array
    sp22: jax.Array
    ext_dot: jax.Array    # sigma^d * dangle_ij  (exterior scan weight)



# ---------------------------------------------------------------------------
# Gather-free grid construction helpers. Table gathers of [N*B*band]-sized
# index arrays dominate the runtime on TPU (~25ns/element); instead:
#  - sequence "diagonal" arrays s[j - d + c] are built with the pad+reshape
#    skew trick (pure layout ops);
#  - 2-index tables go through one-hot einsum chains (VPU FMAs);
#  - deeper tables use a single packed-index take (one gather instead of
#    one per index dimension).
# ---------------------------------------------------------------------------


def _seq_diag(s: jax.Array, n_max: int, band: int, c: int) -> jax.Array:
    """OUT[j, b, d] = s[b, j - d + c] (clamped reads resolve to 0)."""
    B = s.shape[0]
    pad0 = band + 4
    L = pad0 + s.shape[1] + 8
    sp = jnp.zeros((B, L), s.dtype)
    sp = jax.lax.dynamic_update_slice(sp, s, (0, pad0))
    tiled = jnp.broadcast_to(sp[:, None, :], (B, band, L))
    skew = jnp.pad(tiled, ((0, 0), (0, 0), (0, band)))
    flat = skew.reshape(B, band * (L + band))
    sk = flat[:, : band * (L + band - 1)].reshape(B, band, L + band - 1)
    # sk[b, d, t] = tiled[b, d, t - d] = sp[b, t - d]; want t = j + c + pad0
    out = jax.lax.dynamic_slice(
        sk, (0, 0, pad0 + c), (B, band, n_max + 1))
    return jnp.transpose(out, (2, 0, 1))


def _seq_col(s: jax.Array, n_max: int, band: int, c: int) -> jax.Array:
    """OUT[j, b, d] = s[b, j + c] (broadcast along d)."""
    B = s.shape[0]
    pad0 = 8
    L = pad0 + s.shape[1] + 8
    sp = jnp.zeros((B, L), s.dtype)
    sp = jax.lax.dynamic_update_slice(sp, s, (0, pad0))
    col = jax.lax.dynamic_slice(sp, (0, pad0 + c), (B, n_max + 1))
    return jnp.broadcast_to(jnp.transpose(col)[:, :, None],
                            (n_max + 1, B, band))


def _onehot5(x: jax.Array) -> jax.Array:
    return (x[..., None] == jnp.arange(5, dtype=x.dtype)).astype(jnp.float32)


def _pair_onehot(oh_a: jax.Array, oh_b: jax.Array, pair_tab: np.ndarray,
                 n_out: int) -> jax.Array:
    """one-hot of pair_tab[a, b]. Every nonzero value in the 5x5 pair-type
    tables appears for exactly one (a, b), so each output lane is a single
    elementwise product — no [., 5, n_out] transients."""
    lanes = []
    for tv in range(n_out):
        hits = np.argwhere(pair_tab == tv)
        if tv == 0 or len(hits) == 0:
            lanes.append(None)
            continue
        acc = None
        for a, b in hits:
            term = oh_a[..., a] * oh_b[..., b]
            acc = term if acc is None else acc + term
        lanes.append(acc)
    rest = None
    for ln in lanes[1:]:
        if ln is not None:
            rest = ln if rest is None else rest + ln
    lanes[0] = 1.0 - rest if rest is not None else jnp.ones(oh_a.shape[:-1],
                                                            jnp.float32)
    zero = jnp.zeros(oh_a.shape[:-1], jnp.float32)
    return jnp.stack([ln if ln is not None else zero for ln in lanes],
                     axis=-1)


def _lut2(tab: np.ndarray, oh_1: jax.Array, oh_2: jax.Array) -> jax.Array:
    """tab[i1, i2] looked up through one-hot chains."""
    t = jnp.asarray(np.asarray(tab, np.float32))
    tmp = jnp.einsum("...q,pq->...p", oh_2, t)
    return jnp.einsum("...p,...p->...", oh_1, tmp)


def _packed_take(tab_flat: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take(tab_flat, idx, axis=0)


# ---------------------------------------------------------------------------
# Banded char-window table lookups as one-hot MXU contractions.
#
# Round-5 profile (tools/access_trace.py, v5e chip, B=128 N=1024): the seven
# _packed_take gathers in make_grids plus the six in make_outside_grids were
# ~950 ms of the 1463 ms engine — each is a 9.4M-element irregular gather
# running at the chip's ~120 M elem/s scalar-gather rate. But every gathered
# grid value is a function of ONLY the char window around i = j - d and the
# char window around j:  G[j, b, d] = TT[ki(b, j-d), kj(b, j)]  with
# ki/kj in 5^m (m <= 4, so K <= 625). That makes the banded gather a banded
# BILINEAR form over one-hot keys, which the MXU evaluates directly:
#
#   M = OH_i @ TT          (or OH_j @ TT^T, whichever leaves the smaller K)
#   P = M_blk @ OH_blk^T   (j-blocked batched matmul, [B, CI, CJ])
#   G = 72-diagonal band of P, extracted with the pad+reshape skew
#
# One-hot rows select exactly one f32 table entry, so with
# precision='highest' (exact f32 MXU passes) the result is BIT-EXACT equal
# to the gather. ~200 GFLOP of matmul at MXU rates + ~3 GB of streaming
# replace ~950 ms of serial gathers.
# ---------------------------------------------------------------------------

_BIL_CJ = 128   # j-block width of the banded bilinear product


def _use_bilinear(dtype) -> bool:
    """Bilinear lookups pay off on the MXU; on the CPU backend (tests,
    f64 validation) the plain gathers are both faster and required for the
    f64 path (whose sig-postfactor multiplies run in f64, while the
    bilinear folds f32 postfactors into the table)."""
    v = os.environ.get("PRIBLAST_BILINEAR_TABLES", "auto").lower()
    if v in ("0", "false", "never"):
        return False
    if v in ("1", "true", "always"):
        return True
    import jax as _jax

    return dtype == jnp.float32 and _jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=4)
def _char_mesh(n_i: int, n_j: int):
    """np char meshes for a [5^n_i, 5^n_j] TT table: returns (CI, CJ)
    lists where CI[m][ki, kj] = m-th i-side char of key ki (minor-first
    packing: ki = sum_m char_m * 5**m), broadcast against kj."""
    ci = [((np.arange(5 ** n_i) // 5 ** m) % 5)[:, None]
          for m in range(n_i)]
    cj = [((np.arange(5 ** n_j) // 5 ** m) % 5)[None, :]
          for m in range(n_j)]
    return ci, cj


def _bilinear_band_grids(s: jax.Array, n_max: int, band: int, specs):
    """specs: list of (TT [Ki, Kj] float32 np.ndarray, i_offs, j_offs)
    with ki(i) = sum_m s[i + i_offs[m]] * 5**m and kj(j) likewise.
    Returns a list of [N+1, B, band] f32 grids
      G[j, b, d] = TT[ki(j - d), kj(j)]
    (out-of-range char reads are 0 = the pad/unknown code, matching
    _seq_diag/_seq_col zero-fill semantics). Bit-exact vs the equivalent
    _packed_take."""
    B = s.shape[0]
    P0 = band + 8
    NJ = n_max + 1
    CJ = _BIL_CJ
    njb = -(-NJ // CJ)
    NJp = njb * CJ
    CI = CJ + band - 1
    NI = NJp + band - 1          # ext rows t = i + band - 1, i >= 2 - band
    pad_r = max(0, NJp + band + 8 - s.shape[1])
    spad = jnp.pad(s, ((0, 0), (P0, pad_r)))

    def keys(offs, base, n):
        acc = None
        for m, off in enumerate(offs):
            col = lax.dynamic_slice(spad, (0, P0 + base + off), (B, n))
            term = col * (5 ** m)
            acc = term if acc is None else acc + term
        return acc

    oh_cache: dict = {}

    def onehot(side, offs, K):
        ck = (side, offs, K)
        if ck not in oh_cache:
            k = keys(offs, (1 - band) if side == "i" else 0,
                     NI if side == "i" else NJp)
            oh_cache[ck] = (k[..., None] == jnp.arange(K, dtype=k.dtype)
                            ).astype(jnp.float32)
        return oh_cache[ck]

    outs = []
    for TT, i_offs, j_offs in specs:
        Ki, Kj = TT.shape
        OHI = onehot("i", tuple(i_offs), Ki)
        OHJ = onehot("j", tuple(j_offs), Kj)
        TTj = jnp.asarray(np.asarray(TT, np.float32))
        if Ki >= Kj:     # contract the i side first; M carries the small K
            M = jnp.einsum("btk,kq->btq", OHI, TTj, precision="highest")
            lhs, rhs, sub = M, OHJ, "biq,bjq->bij"
        else:
            M = jnp.einsum("btq,kq->btk", OHJ, TTj, precision="highest")
            lhs, rhs, sub = OHI, M, "bik,bjk->bij"
        blocks = []
        for jb in range(njb):
            jlo = jb * CJ
            P = jnp.einsum(sub,
                           lax.dynamic_slice_in_dim(lhs, jlo, CI, 1),
                           lax.dynamic_slice_in_dim(rhs, jlo, CJ, 1),
                           precision="highest")       # [B, CI, CJ]
            Y = jnp.transpose(P, (0, 2, 1))           # [B, CJ, CI]
            Z = _skew_rev(Y)[:, :, :band]             # Z[b,j',e]=P[b,e+j',j']
            blocks.append(jnp.transpose(Z[:, :, ::-1], (1, 0, 2)))
        outs.append(jnp.concatenate(blocks, axis=0)[:NJ])
    return outs


def _gather_s(s: jax.Array, idx: jax.Array) -> jax.Array:
    """s: [B, L] padded codes (s[:,0]=0); idx: [N+1, band] (may be out of
    range — clamped; pads are 0 = unknown)."""
    idxc = jnp.clip(idx, 0, s.shape[1] - 1)
    return s[:, idxc]  # [B, N+1, band]


def make_grids(t: Tables, s: jax.Array, lengths: jax.Array, n_max: int,
               band: int, dtype) -> Grids:
    """Build all weight grids, gather-free where possible. s: [B, n_max +
    ML + 4] int32 1-based padded codes; lengths: [B] int32."""
    B = s.shape[0]
    lm = _linmodel(band - 2)
    r5 = np.arange(5)

    # sequence char arrays (skew broadcasts, no gathers)
    s_i = _seq_diag(s, n_max, band, 0)
    s_i1 = _seq_diag(s, n_max, band, 1)
    s_i2 = _seq_diag(s, n_max, band, 2)
    s_i3 = _seq_diag(s, n_max, band, 3)
    s_j = _seq_col(s, n_max, band, 0)
    s_jm1 = _seq_col(s, n_max, band, -1)
    s_jm2 = _seq_col(s, n_max, band, -2)
    s_jp1 = _seq_col(s, n_max, band, 1)

    oh_i = _onehot5(s_i)
    oh_i1 = _onehot5(s_i1)
    oh_i2 = _onehot5(s_i2)
    oh_j = _onehot5(s_j)
    oh_jm1 = _onehot5(s_jm1)
    oh_jp1 = _onehot5(s_jp1)

    bp_np = np.asarray(lm.bp)
    rtbp_np = np.asarray(lm.rtype)[bp_np]

    ohT1 = _pair_onehot(oh_i1, oh_j, bp_np, 7)
    ohT1r = _pair_onehot(oh_i1, oh_j, rtbp_np, 7)
    ohT2r = _pair_onehot(oh_i2, oh_jm1, rtbp_np, 7)
    ohTC = _pair_onehot(oh_i, oh_jp1, bp_np, 7)
    ohTCr = _pair_onehot(oh_i, oh_jp1, rtbp_np, 7)

    def lut1(tab, oh):
        return jnp.einsum("...p,p->...", oh,
                          jnp.asarray(np.asarray(tab, np.float32)))

    def toint(oh):
        return lut1(np.arange(oh.shape[-1]), oh).astype(jnp.int32)

    T1_i = toint(ohT1)
    T1r_i = toint(ohT1r)
    T2r_i = toint(ohT2r)
    TC_i = toint(ohTC)

    jj = np.arange(n_max + 1)[:, None]
    dd = np.arange(band)[None, :]
    jjb = jnp.asarray(np.broadcast_to(jj, (n_max + 1, band)))[:, None, :]
    ivb = jnp.asarray(np.broadcast_to(jj - dd, (n_max + 1, band)))[:, None, :]
    nb = lengths[None, :, None]

    W_au7 = np.asarray(lm.W_au)
    stackW = _lut2(lm.W_stack, ohT1, ohT2r).astype(dtype)
    t1_nz = T1_i != 0

    use_bil = _use_bilinear(dtype)
    mi_np = np.asarray(lm.W_mism_i, np.float32).reshape(-1)
    mh_np = np.asarray(lm.W_mism_h, np.float32).reshape(-1)
    i11n = np.asarray(lm.W_int11, np.float32).reshape(-1)
    i21n = np.asarray(lm.W_int21, np.float32).reshape(-1)
    i22n = np.asarray(lm.W_int22, np.float32).reshape(-1)
    sgf = lambda k: np.float32(np.exp(-k * lm.lsig))
    if use_bil:
        # the seven banded table lookups as bilinear one-hot contractions
        # (bit-exact vs the takes; see _bilinear_band_grids)
        bp2, rt2 = bp_np, rtbp_np
        # char meshes per (Ki, Kj) domain; i-side offsets pack minor-first
        (b0, b1), (d0, d1) = _char_mesh(2, 2)            # i:(s_i,s_i1) j:(s_j,s_jp1)
        (e0, e1, e2), (f0, f1, f2) = _char_mesh(3, 3)    # i:(0,1,2) j:(-1,0,1)
        (g0, g1, g2), _ = _char_mesh(3, 4)
        _, (h0, h1, h2, h3) = _char_mesh(3, 4)           # j:(-2,-1,0,1)
        (k0, k1, k2, k3), (l0, l1, l2) = _char_mesh(4, 3)

        specs = [
            # mism_in: mi[rt(bp(s_i1, s_j)), s_jp1, s_i]
            (mi_np[(rt2[b1, d0] * 5 + d1) * 5 + b0], (0, 1), (0, 1)),
            # hp_mism: mh[bp(s_i, s_jp1), s_i1, s_j]
            (mh_np[(bp2[b0, d1] * 5 + b1) * 5 + d0], (0, 1), (0, 1)),
            # mism_out: mi[bp(s_i, s_jp1), s_i1, s_j]
            (mi_np[(bp2[b0, d1] * 5 + b1) * 5 + d0], (0, 1), (0, 1)),
            # sp11: i11[TC, rt(bp(s_i2, s_jm1)), s_i1, s_j] * sig(2)
            (i11n[((bp2[e0, f2] * 8 + rt2[e2, f0]) * 5 + e1) * 5 + f1]
             * sgf(2), (0, 1, 2), (-1, 0, 1)),
            # sp12: i21[TC, rt(bp(s_i2, s_jm2)), s_i1, s_jm1, s_j] * sig(3)
            (i21n[(((bp2[g0, h3] * 8 + rt2[g2, h0]) * 5 + g1) * 5 + h1)
                  * 5 + h2] * sgf(3), (0, 1, 2), (-2, -1, 0, 1)),
            # sp21: i21[rt(bp(s_i3, s_jm1)), TC, s_j, s_i1, s_i2] * sig(3)
            (i21n[(((rt2[k3, l0] * 8 + bp2[k0, l2]) * 5 + l1) * 5 + k1)
                  * 5 + k2] * sgf(3), (0, 1, 2, 3), (-1, 0, 1)),
            # sp22: i22[TC, rt(bp(s_i3, s_jm2)), s_i1, s_i2, s_jm1, s_j]
            (i22n[((((bp2[k0, h3] * 8 + rt2[k3, h0]) * 5 + k1) * 5 + k2)
                   * 5 + h1) * 5 + h2] * sgf(4), (0, 1, 2, 3),
             (-2, -1, 0, 1)),
        ]
        (mism_in, hp_mism, mism_out, sp11, sp12, sp21, sp22) = [
            v.astype(dtype) for v in
            _bilinear_band_grids(s, n_max, band, specs)]

    mi_flat = jnp.asarray(mi_np)
    if not use_bil:
        # mismatchI[rtype(T1)][s[j+1]][s[i]] (packed single gather)
        mism_in = _packed_take(
            mi_flat, (T1r_i * 5 + s_jp1) * 5 + s_i).astype(dtype)
    au_in = lut1(W_au7, ohT1r).astype(dtype)

    # dangle for pair (i+1, j) on (i, j)
    w5 = jnp.where(ivb > 0, _lut2(lm.W_dangle5[:7], ohT1, oh_i), 1.0)
    w3 = jnp.where(jjb < nb, _lut2(lm.W_dangle3[:7], ohT1, oh_jp1), 1.0)
    t1_gt2 = jnp.sum(ohT1[..., 3:], axis=-1)
    wau = jnp.where((jjb == nb) & (t1_gt2 > 0.5), lut1(W_au7, ohT1), 1.0)
    dangle_ij = jnp.where(t1_nz, w5 * w3 * wau, 1.0).astype(dtype)

    # hairpin weight for closing (i, j+1), loop size d (static length part)
    hp_len = np.asarray(lm.W_hairpin_len)[np.clip(np.arange(band), 0,
                                                  len(lm.W_hairpin_len) - 1)]
    inv_sig = np.asarray(lm.inv_sig_pow)[: band]
    if not use_bil:
        mh_flat = jnp.asarray(mh_np)
        hp_mism = _packed_take(mh_flat, (TC_i * 5 + s_i1) * 5 + s_j)
    tc_gt2 = jnp.sum(ohTC[..., 3:], axis=-1)
    hp_au = jnp.where(tc_gt2 > 0.5, lut1(W_au7, ohTC), 1.0)
    d_is3 = jnp.asarray((np.arange(band) == 3))[None, None, :]
    hpW = jnp.where(d_is3, hp_au, hp_mism)
    hpW = (hpW * jnp.asarray((hp_len * inv_sig).astype(np.float32))
           [None, None, :]).astype(dtype)

    if not use_bil:
        mism_out = _packed_take(
            mi_flat, (TC_i * 5 + s_i1) * 5 + s_j).astype(dtype)
    au_out = lut1(W_au7, ohTC).astype(dtype)
    mlclose = (float(lm.W_mlc * lm.W_mli) *
               _lut2(lm.W_dangle3[:7], ohTCr, oh_i1) *
               _lut2(lm.W_dangle5[:7], ohTCr, oh_j)).astype(dtype)

    sig = lambda k: dtype(np.exp(-k * lm.lsig))
    b1 = float(lm.W_bulge_len[1])
    ohX10 = _pair_onehot(oh_i2, oh_j, rtbp_np, 7)
    ohX01 = _pair_onehot(oh_i1, oh_jm1, rtbp_np, 7)
    sp10 = (b1 * _lut2(lm.W_stack, ohTC, ohX10) * sig(1)).astype(dtype)
    sp01 = (b1 * _lut2(lm.W_stack, ohTC, ohX01) * sig(1)).astype(dtype)

    # deep int-loop tables: packed single gathers (bilinear path computed
    # them above as one-hot MXU contractions)
    if not use_bil:
        i11 = jnp.asarray(i11n)
        i21 = jnp.asarray(i21n)
        i22 = jnp.asarray(i22n)
        t12r = toint(_pair_onehot(oh_i2, _onehot5(s_jm2), rtbp_np, 7))
        t21r = toint(_pair_onehot(_onehot5(s_i3), oh_jm1, rtbp_np, 7))
        t22r = toint(_pair_onehot(_onehot5(s_i3), _onehot5(s_jm2), rtbp_np, 7))
        sp11 = (_packed_take(i11, ((TC_i * 8 + T2r_i) * 5 + s_i1) * 5 + s_j)
                * sig(2)).astype(dtype)
        sp12 = (_packed_take(
            i21, (((TC_i * 8 + t12r) * 5 + s_i1) * 5 + s_jm1) * 5 + s_j)
            * sig(3)).astype(dtype)
        sp21 = (_packed_take(
            i21, (((t21r * 8 + TC_i) * 5 + s_j) * 5 + s_i1) * 5 + s_i2)
            * sig(3)).astype(dtype)
        sp22 = (_packed_take(
            i22, ((((TC_i * 8 + t22r) * 5 + s_i1) * 5 + s_i2) * 5 + s_jm1)
            * 5 + s_j) * sig(4)).astype(dtype)

    validC = (TC_i != 0) & (jjb != nb)
    sigp = jnp.asarray(np.asarray(lm.sig_pow[: band], np.float32))
    ext_dot = (sigp[None, None, :] * dangle_ij).astype(dtype)

    return Grids(
        stackW=stackW, t1_nz=t1_nz, mism_in=mism_in, au_in=au_in,
        dangle_ij=dangle_ij, validC=validC, hpW=hpW, mism_out=mism_out,
        au_out=au_out, mlclose=mlclose, sp10=sp10, sp01=sp01, sp11=sp11,
        sp12=sp12, sp21=sp21, sp22=sp22, ext_dot=ext_dot,
    )



_SCAN_BLOCK = 8


def _blocked_scan(col_step, carry0, xs, n_cols, reverse: bool):
    """Run a per-column scan body over blocks of _SCAN_BLOCK columns per
    lax.scan step: the per-step HBM slices of the (many, small) stacked
    inputs/outputs are K times larger, amortizing DMA latency. Semantics
    are identical to lax.scan(col_step, carry0, xs)."""
    K = _SCAN_BLOCK
    n_blocks = (n_cols + K - 1) // K
    padded = n_blocks * K

    def pad_x(x):
        pad = [(0, padded - n_cols)] + [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad)
        return xp.reshape((n_blocks, K) + x.shape[1:])

    xsb = jax.tree.map(pad_x, xs)

    def block_step(c, xb):
        ys_k = []
        order = range(K - 1, -1, -1) if reverse else range(K)
        slot = {}
        for k in order:
            xk = jax.tree.map(lambda a: a[k], xb)
            c, y = col_step(c, xk)
            slot[k] = y
        ys = jax.tree.map(lambda *a: jnp.stack(a, axis=0),
                          *[slot[k] for k in range(K)])
        return c, ys

    carry, ysb = lax.scan(block_step, carry0, xsb, reverse=reverse)

    def unpad_y(y):
        flat = y.reshape((padded,) + y.shape[2:])
        return flat[:n_cols]

    return carry, jax.tree.map(unpad_y, ysb)


def inside_pass(t: Tables, g: Grids, n_max: int, band: int, B: int, dtype):
    """Column scan of the inside recurrences. Returns stacked per-column
    state [N+1, B, band] for stem, stem_mism, stem_au, multi, multi1,
    multi2 and the log-exterior A [N+1, B]."""
    W = band - 2
    sig2 = dtype(np.exp(-2 * t.lsig))
    sig1 = dtype(np.exp(-t.lsig))
    zcol = jnp.zeros((B, band), dtype)

    carry0 = dict(
        stem_prev=zcol, stemend_prev=zcol, multi2_prev=zcol,
        smw=jnp.zeros((B, ML + 1, band), dtype),   # stem_mism cols j-1..j-ML-?
        saw=jnp.zeros((B, ML + 1, band), dtype),   # stem_au window
        m1w=jnp.zeros((B, W + 1, band), dtype),    # multi1 cols j-1..j-W-1
        awin=jnp.zeros((B, W + 2), dtype),         # A[j-1-t], t = 0..W+1
        a_prev=jnp.zeros((B,), dtype),
    )

    def step(c, x):
        (stackW, t1_nz, mism_in, au_in, dangle_ij, validC, hpW, mism_out,
         au_out, mlclose, sp10, sp01, sp11, sp12, sp21, sp22, ext_dot) = x

        stem_prev, stemend_prev = c["stem_prev"], c["stemend_prev"]

        # stem: from (i+1, j-1) = prev column, span d-2
        inner = (_shift_d(stem_prev, 2) * stackW + _shift_d(stemend_prev, 2))
        stem = jnp.where(t1_nz, inner * sig2, 0.0)
        stem_m = stem * mism_in
        stem_a = stem * au_in

        # multi2
        multi2 = (jnp.where(t1_nz, stem * t.W_mli * dangle_ij, 0.0)
                  + _shift_d(c["multi2_prev"], 1) * (t.W_mlb * sig1))

        # multibif: sum_u multi1[j-u][d-u] * multi2[j][u]
        m1w = c["m1w"]  # [B, W+1, band]; index u-1 = column j-u
        m1x = _shift_d(_skew_fwd(m1w), 1)  # [b, u-1, d] = m1w[u-1][d-u]
        mb = jnp.einsum("bud,bu->bd", m1x[:, : W, :], multi2[:, 1 : W + 1],
                        preferred_element_type=dtype)
        multi1 = multi2 + mb

        # multi: triangular decay matmul over spans
        multi = jnp.einsum("bt,td->bd", mb, t.Lmat,
                           preferred_element_type=dtype)

        # stemend
        smw_full = jnp.concatenate([stem_m[:, None, :], c["smw"][:, :-1, :]],
                                   axis=1)  # u2 = 0..ML -> cols j-u2
        saw_full = jnp.concatenate([stem_a[:, None, :], c["saw"][:, :-1, :]],
                                   axis=1)
        # general interior: G[b, r, d] = sum_u2 smw[b, u2, d] * K2[r, u2]
        G = jnp.einsum("bud,ru->brd", smw_full, t.K2,
                       preferred_element_type=dtype)
        gen = jnp.sum(_skew_fwd(G), axis=1)  # K2 rows 0..1 are zero
        se = hpW + gen * mism_out

        # bulges: same-column (u1-side) via banded matmul; window (u2-side)
        bul = jnp.einsum("bt,td->bd", stem_a, t.KbMat,
                         preferred_element_type=dtype)
        bul = bul + jnp.einsum("bud,u->bd", _skew_fwd(saw_full), t.Kb,
                               preferred_element_type=dtype)
        se = se + bul * au_out

        # small-loop specials (cells: (1,0)=cur col d-1, (0,1)=prev d-1,
        # (1,1)=prev d-2, (1,2)=col j-2 d-3, (2,1)=prev d-3, (2,2)=col j-2 d-4)
        se = se + sp10 * _shift_d(stem, 1)
        se = se + sp01 * _shift_d(stem_prev, 1)
        se = se + sp11 * _shift_d(stem_prev, 2)
        se = se + sp21 * _shift_d(stem_prev, 3)
        # (1,2) and (2,2) need raw stem of column j-2 — carried below
        se = se + sp12 * _shift_d(c["stem_prev2"], 3)
        se = se + sp22 * _shift_d(c["stem_prev2"], 4)

        # multiloop closing
        se = se + multi * mlclose
        stemend = jnp.where(validC, se, 0.0)

        # exterior scan: A[j] = A[j-1] + log1p(sum_dp stem[dp] * ext_dot[dp]
        #                                       * exp(A[j-dp] - A[j-1]))
        awin = c["awin"]  # awin[:, tpos] = A[j-1-tpos]
        a_prev = c["a_prev"]
        # A[j-dp] for dp = 1..W+1 -> awin[:, dp-1]
        expd = jnp.exp(awin - a_prev[:, None])  # <= 1
        dot = jnp.sum(stem[:, 1:] * ext_dot[:, 1:] * expd[:, : band - 1],
                      axis=1)
        a_cur = a_prev + jnp.log1p(dot)

        new_c = dict(
            stem_prev=stem, stemend_prev=stemend, multi2_prev=multi2,
            stem_prev2=stem_prev,
            smw=smw_full,
            saw=saw_full,
            m1w=jnp.concatenate([multi1[:, None, :], m1w[:, :-1, :]], axis=1),
            awin=jnp.concatenate([a_cur[:, None], awin[:, :-1]], axis=1),
            a_prev=a_cur,
        )
        ys = (stem, stem_m, stem_a, multi, multi1, multi2, a_cur)
        return new_c, ys

    carry0["stem_prev2"] = zcol
    xs = tuple(g)
    _, ys = _blocked_scan(step, carry0, xs, n_max + 1, reverse=False)
    return ys  # each [N+1, B, ...]


def _shift_cols(x: jax.Array, k: int) -> jax.Array:
    """shift along the leading (column) axis: out[j] = x[j - k] (k may be
    negative: out[j] = x[j + |k|]); zero fill."""
    if k == 0:
        return x
    if k > 0:
        pad = [(k, 0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)[: x.shape[0]]
    pad = [(0, -k)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[-k:]


def _diag_view(x: jax.Array, band: int) -> jax.Array:
    """D[i, b, e] = x[i + e, b, e] for a [N+1, B, band] column-major banded
    array — the row-major (left-end indexed) view, via the pad+reshape skew
    (two transposes + layout ops instead of `band` slice-concats)."""
    N, B = x.shape[0], x.shape[1]
    U = band
    y = jnp.transpose(x, (1, 2, 0))            # [B, band, N]
    z = y[:, ::-1, :]
    zp = jnp.pad(z, ((0, 0), (0, 0), (0, U)))
    flat = zp.reshape(B, U * (N + U))
    sk = flat[:, : U * (N + U - 1)].reshape(B, U, N + U - 1)
    out = sk[:, ::-1, U - 1 : U - 1 + N]       # out[b, u, i] = y[b, u, i+u]
    return jnp.transpose(out, (2, 0, 1))


class OutsideGrids(NamedTuple):
    """Per-column grids for the outside pass, [N+1, B, band] (column q)."""
    t2_nz: jax.Array      # pair (p+1, q) exists
    seed: jax.Array       # exp(A[p] + B[q] - logZ + d lsig) precursor: A[q-d]
    dangle_pq: jax.Array  # same dangle as inside (pair (p+1, q))
    bse_mism_w: jax.Array  # prefold weight for bse cells (closing (p, q+1))
    bse_au_w: jax.Array
    mism_out2: jax.Array  # mismatch postfactor for the (p, q) stem pair side
    au_out2: jax.Array
    contW: jax.Array      # helix continuation stack weight (masked)
    mlclose_o: jax.Array  # beta multi closing weight
    spo10: jax.Array
    spo01: jax.Array
    spo11: jax.Array
    spo12: jax.Array
    spo21: jax.Array
    spo22: jax.Array
    m2diag: jax.Array     # multi2[q+t][t]
    valid_int: jax.Array  # (p != 0) & (q != n)


def make_outside_grids(t: Tables, s: jax.Array, lengths: jax.Array,
                       n_max: int, band: int, dtype, g: Grids,
                       multi2_full: jax.Array, A_full: jax.Array,
                       B_full: jax.Array, logZ: jax.Array) -> OutsideGrids:
    B = s.shape[0]
    lm = _linmodel(band - 2)

    s_p = _seq_diag(s, n_max, band, 0)
    s_p1 = _seq_diag(s, n_max, band, 1)
    s_pm1 = _seq_diag(s, n_max, band, -1)
    s_pm2 = _seq_diag(s, n_max, band, -2)
    s_q = _seq_col(s, n_max, band, 0)
    s_q1 = _seq_col(s, n_max, band, 1)
    s_q2 = _seq_col(s, n_max, band, 2)
    s_q3 = _seq_col(s, n_max, band, 3)

    oh_p = _onehot5(s_p)
    oh_p1 = _onehot5(s_p1)
    oh_pm1 = _onehot5(s_pm1)
    oh_q = _onehot5(s_q)
    oh_q1 = _onehot5(s_q1)

    bp_np = np.asarray(lm.bp)
    rtbp_np = np.asarray(lm.rtype)[bp_np]

    ohT2 = _pair_onehot(oh_p1, oh_q, bp_np, 7)
    ohT2r = _pair_onehot(oh_p1, oh_q, rtbp_np, 7)
    ohTC = _pair_onehot(oh_p, oh_q1, bp_np, 7)
    ohTCr = _pair_onehot(oh_p, oh_q1, rtbp_np, 7)

    def lut1(tab, oh):
        return jnp.einsum("...p,p->...", oh,
                          jnp.asarray(np.asarray(tab, np.float32)))

    def toint(oh):
        return lut1(np.arange(oh.shape[-1]), oh).astype(jnp.int32)

    T2_i = toint(ohT2)
    T2r_i = toint(ohT2r)
    TC_i = toint(ohTC)

    jj = np.arange(n_max + 1)[:, None]
    dd = np.arange(band)[None, :]
    jjb = jnp.asarray(np.broadcast_to(jj, (n_max + 1, band)))[:, None, :]
    pvb = jnp.asarray(np.broadcast_to(jj - dd, (n_max + 1, band)))[:, None, :]
    nb = lengths[None, :, None]

    # seed: exp(A[q-d] + B[q] - logZ + d lsig) — A diagonal via skew
    A_t = jnp.transpose(A_full)  # [B, N+1]
    A_diag = _seq_diag(A_t.astype(jnp.float32), n_max, band, 0)
    # _seq_diag zero-fills; A[q-d] for q-d<0 masked below anyway
    ddv = jnp.asarray(np.broadcast_to(dd, (n_max + 1, band)))[:, None, :]
    Bq = jnp.transpose(B_full)[:, :]
    Bq = jnp.transpose(Bq)[:, :, None]
    seed = jnp.exp(A_diag + Bq - logZ[None, :, None] +
                   (ddv * dtype(t.lsig)).astype(jnp.float32)).astype(dtype)
    seed = jnp.where(pvb >= 0, seed, 0.0)

    W_au7 = np.asarray(lm.W_au)
    mi_np = np.asarray(lm.W_mism_i, np.float32).reshape(-1)
    i11n = np.asarray(lm.W_int11, np.float32).reshape(-1)
    i21n = np.asarray(lm.W_int21, np.float32).reshape(-1)
    i22n = np.asarray(lm.W_int22, np.float32).reshape(-1)
    sgf = lambda k: np.float32(np.exp(-k * lm.lsig))
    use_bil = _use_bilinear(dtype)
    if use_bil:
        # the six banded table lookups as bilinear one-hot contractions
        # (bit-exact vs the takes; masks/sig postfactors folded into TT)
        bp2, rt2 = bp_np, rtbp_np
        (b0, b1), (d0, d1) = _char_mesh(2, 2)          # i:(0,1) j:(0,1)
        (e0, e1, e2), (f0, f1, f2) = _char_mesh(3, 3)  # i:(-1,0,1) j:(0,1,2)
        (g0, g1, g2), _ = _char_mesh(3, 4)
        _, (h0, h1, h2, h3) = _char_mesh(3, 4)         # j:(0,1,2,3)
        (k0, k1, k2, k3), (l0, l1, l2) = _char_mesh(4, 3)  # i:(-2,-1,0,1)

        def msk(cond, v):
            return np.where(cond != 0, v, np.float32(0.0))

        specs = [
            # bse_mism_w: [TC!=0] mi[TC, s_p1, s_q], TC = bp(s_p, s_q1)
            (msk(bp2[b0, d1], mi_np[(bp2[b0, d1] * 5 + b1) * 5 + d0]),
             (0, 1), (0, 1)),
            # mism_out2: mi[rt(bp(s_p1, s_q)), s_q1, s_p]
            (mi_np[(rt2[b1, d0] * 5 + d1) * 5 + b0], (0, 1), (0, 1)),
            # spo11: [tc11!=0] i11[tc11, T2r, s_p, s_q1]*sig(2),
            #   tc11 = bp(s_pm1, s_q2), T2r = rt(bp(s_p1, s_q))
            (msk(bp2[e0, f2], i11n[((bp2[e0, f2] * 8 + rt2[e2, f0]) * 5
                                    + e1) * 5 + f1] * sgf(2)),
             (-1, 0, 1), (0, 1, 2)),
            # spo12: [tc12!=0] i21[tc12, T2r, s_p, s_q1, s_q2]*sig(3),
            #   tc12 = bp(s_pm1, s_q3)
            (msk(bp2[g0, h3], i21n[(((bp2[g0, h3] * 8 + rt2[g2, h0]) * 5
                                     + g1) * 5 + h1) * 5 + h2] * sgf(3)),
             (-1, 0, 1), (0, 1, 2, 3)),
            # spo21: [tc21!=0] i21[T2r, tc21, s_q1, s_pm1, s_p]*sig(3),
            #   tc21 = bp(s_pm2, s_q2)
            (msk(bp2[k0, l2], i21n[(((rt2[k3, l0] * 8 + bp2[k0, l2]) * 5
                                     + l1) * 5 + k1) * 5 + k2] * sgf(3)),
             (-2, -1, 0, 1), (0, 1, 2)),
            # spo22: [tc22!=0] i22[tc22, T2r, s_pm1, s_p, s_q1, s_q2]*sig(4),
            #   tc22 = bp(s_pm2, s_q3)
            (msk(bp2[k0, h3], i22n[((((bp2[k0, h3] * 8 + rt2[k3, h0]) * 5
                                      + k1) * 5 + k2) * 5 + h1) * 5 + h2]
                 * sgf(4)),
             (-2, -1, 0, 1), (0, 1, 2, 3)),
        ]
        (bse_mism_w_b, mism_out2_b, spo11, spo12, spo21, spo22) = [
            v.astype(dtype) for v in
            _bilinear_band_grids(s, n_max, band, specs)]

    mi_flat = jnp.asarray(mi_np)
    cmask = TC_i != 0
    if use_bil:
        bse_mism_w = bse_mism_w_b
    else:
        bse_mism_w = jnp.where(
            cmask, _packed_take(mi_flat, (TC_i * 5 + s_p1) * 5 + s_q),
            0.0).astype(dtype)
    bse_au_w = jnp.where(cmask, lut1(W_au7, ohTC), 0.0).astype(dtype)

    mlclose_o = (float(lm.W_mlc * lm.W_mli) *
                 _lut2(lm.W_dangle3[:7], ohTCr, oh_p1) *
                 _lut2(lm.W_dangle5[:7], ohTCr, oh_q)).astype(dtype)

    sig = lambda k: dtype(np.exp(-k * lm.lsig))
    b1 = float(lm.W_bulge_len[1])

    # closing types of displaced bse cells (p - v1, q + v2)
    def ct_oh(v1, v2):
        sa = _onehot5(_seq_diag(s, n_max, band, -v1))
        sb = _onehot5(_seq_col(s, n_max, band, v2 + 1))
        return _pair_onehot(sa, sb, bp_np, 7)

    oh10 = ct_oh(1, 0)
    oh01 = ct_oh(0, 1)
    spo10 = (b1 * _lut2(lm.W_stack, oh10, ohT2r) * sig(1)).astype(dtype)
    spo01 = (b1 * _lut2(lm.W_stack, oh01, ohT2r) * sig(1)).astype(dtype)
    if not use_bil:
        tc11 = toint(ct_oh(1, 1))
        tc12 = toint(ct_oh(1, 2))
        tc21 = toint(ct_oh(2, 1))
        tc22 = toint(ct_oh(2, 2))

        i11 = jnp.asarray(i11n)
        i21 = jnp.asarray(i21n)
        i22 = jnp.asarray(i22n)
        spo11 = jnp.where(tc11 != 0, _packed_take(
            i11, ((tc11 * 8 + T2r_i) * 5 + s_p) * 5 + s_q1) * sig(2),
            0.0).astype(dtype)
        spo12 = jnp.where(tc12 != 0, _packed_take(
            i21, (((tc12 * 8 + T2r_i) * 5 + s_p) * 5 + s_q1) * 5 + s_q2)
            * sig(3), 0.0).astype(dtype)
        spo21 = jnp.where(tc21 != 0, _packed_take(
            i21, (((T2r_i * 8 + tc21) * 5 + s_q1) * 5 + s_pm1) * 5 + s_p)
            * sig(3), 0.0).astype(dtype)
        spo22 = jnp.where(tc22 != 0, _packed_take(
            i22, ((((tc22 * 8 + T2r_i) * 5 + s_pm1) * 5 + s_p) * 5 + s_q1)
            * 5 + s_q2) * sig(4), 0.0).astype(dtype)

    tcont_nz = jnp.sum(ohTC[..., 1:], axis=-1) > 0.5
    contW = jnp.where(tcont_nz & (pvb != 0) & (jjb != nb),
                      _lut2(lm.W_stack, ohTC, ohT2r) * sig(2),
                      0.0).astype(dtype)

    m2diag = _diag_view(multi2_full, band)
    m2mask = np.ones(band, np.float32)
    m2mask[band - 1] = 0.0
    m2diag = (m2diag * jnp.asarray(m2mask)[None, None, :]).astype(dtype)

    valid_int = (pvb > 0) & (jjb != nb)

    if not use_bil:
        mism_out2_b = _packed_take(
            mi_flat, (T2r_i * 5 + s_q1) * 5 + s_p).astype(dtype)
    return OutsideGrids(
        t2_nz=T2_i != 0, seed=seed, dangle_pq=g.dangle_ij,
        bse_mism_w=bse_mism_w, bse_au_w=bse_au_w,
        mism_out2=mism_out2_b,
        au_out2=lut1(W_au7, ohT2r).astype(dtype),
        contW=contW, mlclose_o=mlclose_o,
        spo10=spo10, spo01=spo01, spo11=spo11, spo12=spo12, spo21=spo21,
        spo22=spo22, m2diag=m2diag, valid_int=valid_int,
    )


def outside_pass(t: Tables, og: OutsideGrids, multi1_full: jax.Array,
                 n_max: int, band: int, B: int, dtype):
    """Column scan (descending q) of the outside recurrences. Returns
    stacked bse, bse_mism, bse_au, b_multi, b_multi2 ([N+1, B, band])."""
    W = band - 2
    sig2 = dtype(np.exp(-2 * t.lsig))
    sig1 = dtype(np.exp(-t.lsig))
    decay = dtype(t.W_mlb) * sig1
    zcol = jnp.zeros((B, band), dtype)

    # multi1 window source, front-padded so dynamic_slice never clamps:
    # padded index q + band corresponds to column q.
    m1_pad = jnp.concatenate(
        [jnp.zeros((band, B, band), dtype), multi1_full], axis=0)

    # beta multi decay matmul (upper-triangular, e >= d)
    tt = np.arange(band)
    LmatU = np.where(tt[:, None] >= tt[None, :],
                     float(t.W_mlb * np.exp(-t.lsig)) **
                     np.maximum(tt[:, None] - tt[None, :], 0), 0.0)
    LmatU = jnp.asarray(LmatU, dtype)
    # bulge conv over same column, larger spans: KbMatU[e, d] = Kb[e - d]
    diff = tt[:, None] - tt[None, :]
    Kb_np = _linmodel(band - 2).K_bulge
    KbMatU = jnp.asarray(
        np.where((diff >= 2) & (diff <= ML),
                 Kb_np[np.clip(diff, 0, ML)], 0.0), dtype)

    carry0 = dict(
        bstem_next=zcol,                       # b_stem col q+1
        bsew=jnp.zeros((B, ML + 1, band), dtype),    # bse_mism cols q+1..q+ML+?
        bsaw=jnp.zeros((B, ML + 1, band), dtype),
        bse_raw=jnp.zeros((B, 3, band), dtype),      # raw bse cols q+1, q+2
        bmbw=jnp.zeros((B, W + 1, band), dtype),     # b_multibif cols q+1..q+W+1
        bmulti2_next=zcol,
        # the blocked reverse scan visits the padded tail columns first;
        # qidx must start at the padded last column so real columns align
        qidx=jnp.asarray(
            ((n_max + 1 + _SCAN_BLOCK - 1) // _SCAN_BLOCK) * _SCAN_BLOCK - 1,
            jnp.int32),
    )

    def step(c, x):
        (t2_nz, seed, dangle_pq, bse_mism_w, bse_au_w, mism_out2, au_out2,
         contW, mlclose_o, spo10, spo01, spo11, spo12, spo21, spo22,
         m2diag, valid_int) = x
        q = c["qidx"]

        # stemend: b_stem[q+1][d+2] * sig^2, masked d < W
        bse = _shift_d(c["bstem_next"], -2) * sig2
        dmask = jnp.arange(band) < W
        bse = jnp.where(valid_int & dmask[None, :], bse, 0.0)
        bse_m = bse * bse_mism_w
        bse_a = bse * bse_au_w

        # multi: upper-triangular decay matmul of the closing term
        clos = bse * mlclose_o
        clos = jnp.where(valid_int, clos, 0.0)
        bmulti = jnp.einsum("be,ed->bd", clos, LmatU,
                            preferred_element_type=dtype)
        bmulti = jnp.where(valid_int, bmulti, 0.0)

        # multi1: sum_t bmb[q+t][t+d] * multi2[q+t][t]
        bmbw = c["bmbw"]  # [B, W+1, band]; index t-1 = col q+t
        bmbx = _shift_d(_skew_rev(bmbw), -1)  # [b, t-1, d] = bmbw[t-1][d+t]
        bm1 = jnp.einsum("btd,bt->bd", bmbx[:, : W, :], m2diag[:, 1 : W + 1],
                         preferred_element_type=dtype)
        bm1 = jnp.where(valid_int, bm1, 0.0)

        bmb = bm1 + bmulti  # b_multibif

        # multi2: bm1 + decayed next-column + same-column bif closings.
        # Needs multi1[q - d][f]: slice padded cols q-band+1..q (padded index
        # of col c is c + band), then flip so M1COLS[d] = col q - d.
        m1win = lax.dynamic_slice(
            m1_pad, (q + 1, jnp.zeros((), q.dtype), jnp.zeros((), q.dtype)),
            (band, B, band))
        M1COLS = jnp.transpose(jnp.flip(m1win, axis=0), (1, 0, 2))  # [B,d,f]
        # same-column reduction bound: e = d + f <= W (raccess.cpp:342)
        bmb_masked = bmb * jnp.asarray(
            np.concatenate([np.ones(band - 1), [0.0]]), dtype)[None, :]
        bm2 = bm1 + _shift_d(c["bmulti2_next"], -1) * decay
        bmb_t = jnp.broadcast_to(bmb_masked[:, None, :], (B, W, band))
        bmb_sh = _shift_d(_skew_rev(bmb_t), -1)  # [b, f-1, d] = bmb[d+f]
        bm2 = bm2 + jnp.einsum("bfd,bdf->bd", bmb_sh,
                               M1COLS[:, :, 1 : W + 1],
                               preferred_element_type=dtype)
        bm2 = jnp.where(valid_int, bm2, 0.0)

        # stem
        out = seed * dangle_pq
        bsew_full = c["bsew"]  # cols q+1..; need cols q..q+ML: prepend current
        bsew_cur = jnp.concatenate([bse_m[:, None, :], bsew_full[:, :-1, :]],
                                   axis=1)
        bsaw_cur = jnp.concatenate([bse_a[:, None, :], c["bsaw"][:, :-1, :]],
                                   axis=1)
        Gp = jnp.einsum("bud,ru->brd", bsew_cur, t.K2,
                        preferred_element_type=dtype)
        gen = jnp.sum(_skew_rev(Gp), axis=1)
        out = out + gen * mism_out2

        bul = jnp.einsum("be,ed->bd", bse_a, KbMatU,
                         preferred_element_type=dtype)
        bul = bul + jnp.einsum("bud,u->bd", _skew_rev(bsaw_cur), t.Kb,
                               preferred_element_type=dtype)
        out = out + bul * au_out2

        # specials: bse cells (v1, v2) at col q+v2, span d+v1+v2
        bse_raw_q1 = c["bse_raw"][:, 0, :]
        bse_raw_q2 = c["bse_raw"][:, 1, :]
        out = out + spo10 * _shift_d(bse, -1)
        out = out + spo01 * _shift_d(bse_raw_q1, -1)
        out = out + spo11 * _shift_d(bse_raw_q1, -2)
        out = out + spo21 * _shift_d(bse_raw_q1, -3)
        out = out + spo12 * _shift_d(bse_raw_q2, -3)
        out = out + spo22 * _shift_d(bse_raw_q2, -4)

        # helix continuation + multiloop participation
        out = out + _shift_d(c["bstem_next"], -2) * contW
        out = out + bm2 * dtype(t.W_mli) * dangle_pq
        bstem = jnp.where(t2_nz, out, 0.0)

        new_c = dict(
            bstem_next=bstem,
            bsew=bsew_cur,
            bsaw=bsaw_cur,
            bse_raw=jnp.concatenate([bse[:, None, :], c["bse_raw"][:, :-1, :]],
                                    axis=1),
            bmbw=jnp.concatenate([bmb_masked[:, None, :],
                                  c["bmbw"][:, :-1, :]], axis=1),
            bmulti2_next=bm2,
            qidx=q - 1,
        )
        ys = (bse, bse_m, bse_a, bmulti, bm2)
        return new_c, ys

    xs = tuple(og)
    _, ys = _blocked_scan(step, carry0, xs, n_max + 1, reverse=True)
    return ys


def b_outer_scan(stem_full: jax.Array, ext_dot_full: jax.Array, n_max: int,
                 band: int, B: int, dtype, lengths: jax.Array) -> jax.Array:
    """log beta_outer backward scan (reference: raccess.cpp:260-271).

    B[i] = B[i+1] + log1p(sum_dp stem[i+dp][dp] * ext_dot[i+dp][dp]
                           * exp(B[i+dp] - B[i+1]))
    using the diagonal views of the stacked inside outputs."""
    sd = _diag_view(stem_full * ext_dot_full, band)  # [i, B, dp]

    carry0 = dict(bwin=jnp.zeros((B, band), dtype),
                  b_next=jnp.zeros((B,), dtype))

    def step(c, x):
        sdot = x  # [B, band]
        bwin, b_next = c["bwin"], c["b_next"]
        # B[i+dp] = bwin[dp-1]
        expd = jnp.exp(bwin - b_next[:, None])
        dot = jnp.sum(sdot[:, 1:] * expd[:, : band - 1], axis=1)
        b_cur = b_next + jnp.log1p(dot)
        new_c = dict(bwin=jnp.concatenate([b_cur[:, None], bwin[:, :-1]],
                                          axis=1),
                     b_next=b_cur)
        return new_c, b_cur

    _, Bl = lax.scan(step, carry0, sd, reverse=True)
    # positions beyond each sequence's length must read 0 (B[n] = 0); the
    # scan ran over padding columns where stems are 0, so B is constant
    # (= B[n]) there — subtract that constant per sequence.
    offs = jnp.take_along_axis(Bl, lengths[None, :], axis=0)  # B[n_b]
    return Bl - offs


class ProbGrids(NamedTuple):
    """Weight grids for the probability biloop specials, on the bse-cell
    grid [N+1(col jc), B, band(ecell)]; closing pair is (i, j) = (jc-ecell,
    jc+1)."""
    pb10: jax.Array
    pb01: jax.Array
    pb11: jax.Array
    pb12: jax.Array
    pb21: jax.Array
    pb22: jax.Array


def make_prob_grids(t: Tables, s: jax.Array, n_max: int, band: int,
                    dtype) -> ProbGrids:
    lm = _linmodel(band - 2)
    bp_np = np.asarray(lm.bp)
    rtbp_np = np.asarray(lm.rtype)[bp_np]

    # cell grid: [col jc][ecell]; closing pair (i, j) = (jc-ecell, jc+1)
    s_i = _seq_diag(s, n_max, band, 0)
    s_i1 = _seq_diag(s, n_max, band, 1)
    s_i2 = _seq_diag(s, n_max, band, 2)
    s_i3 = _seq_diag(s, n_max, band, 3)
    s_j = _seq_col(s, n_max, band, 1)
    s_jm1 = _seq_col(s, n_max, band, 0)
    s_jm2 = _seq_col(s, n_max, band, -1)
    s_jm3 = _seq_col(s, n_max, band, -2)

    oh_i = _onehot5(s_i)
    oh_i1 = _onehot5(s_i1)
    oh_i2 = _onehot5(s_i2)
    oh_j = _onehot5(s_j)
    oh_jm1 = _onehot5(s_jm1)
    oh_jm2 = _onehot5(s_jm2)

    ohTCL = _pair_onehot(oh_i, oh_j, bp_np, 7)

    def lut1(tab, oh):
        return jnp.einsum("...p,p->...", oh,
                          jnp.asarray(np.asarray(tab, np.float32)))

    def toint(oh):
        return lut1(np.arange(oh.shape[-1]), oh).astype(jnp.int32)

    TCL_i = toint(ohTCL)
    nz = TCL_i != 0
    sig = lambda k: dtype(np.exp(-k * lm.lsig))
    b1 = float(lm.W_bulge_len[1])
    i11 = jnp.asarray(np.asarray(lm.W_int11, np.float32).reshape(-1))
    i21 = jnp.asarray(np.asarray(lm.W_int21, np.float32).reshape(-1))
    i22 = jnp.asarray(np.asarray(lm.W_int22, np.float32).reshape(-1))

    oh_t10 = _pair_onehot(oh_i2, oh_jm1, rtbp_np, 7)
    oh_t01 = _pair_onehot(oh_i1, oh_jm2, rtbp_np, 7)
    t11 = toint(_pair_onehot(oh_i2, oh_jm2, rtbp_np, 7))
    t12 = toint(_pair_onehot(oh_i2, _onehot5(s_jm3), rtbp_np, 7))
    t21 = toint(_pair_onehot(_onehot5(s_i3), oh_jm2, rtbp_np, 7))
    t22 = toint(_pair_onehot(_onehot5(s_i3), _onehot5(s_jm3), rtbp_np, 7))

    def mask(w):
        return jnp.where(nz, w, 0.0).astype(dtype)

    pb10 = mask(b1 * _lut2(lm.W_stack, ohTCL, oh_t10)) * sig(1)
    pb01 = mask(b1 * _lut2(lm.W_stack, ohTCL, oh_t01)) * sig(1)
    pb11 = mask(_packed_take(
        i11, ((TCL_i * 8 + t11) * 5 + s_i1) * 5 + s_jm1)) * sig(2)
    pb12 = mask(_packed_take(
        i21, (((TCL_i * 8 + t12) * 5 + s_i1) * 5 + s_jm2) * 5 + s_jm1)) * sig(3)
    pb21 = mask(_packed_take(
        i21, (((t21 * 8 + TCL_i) * 5 + s_jm1) * 5 + s_i1) * 5 + s_i2)) * sig(3)
    pb22 = mask(_packed_take(
        i22, ((((TCL_i * 8 + t22) * 5 + s_i1) * 5 + s_i2) * 5 + s_jm2) * 5
        + s_jm1)) * sig(4)
    return ProbGrids(pb10, pb01, pb11, pb12, pb21, pb22)


def probability_pass(t: Tables, g: Grids, pg: ProbGrids, ins, outs,
                     A_full, B_full, logZ, w: int, n_max: int, band: int,
                     dtype):
    """Window-unpaired probabilities for window sizes w and w+1, fully
    vectorized (reference: raccess.cpp:421-681). Returns the 8 component
    arrays indexed [N+2, B] by window start x (1-based)."""
    W = band - 2
    stem, stem_m, stem_a, multi, multi1, multi2, _ = ins
    bse, bse_m, bse_a, b_multi, b_multi2 = outs
    Np = n_max + 2

    def xarr():
        return jnp.zeros((Np, stem.shape[1]), dtype)

    # ---- exterior: exp(A[x-1] + B[x+w-1] - logZ) --------------------------
    def exterior(wsz):
        a = _shift_cols(A_full, 1)                      # A[x-1] at row x
        b = _shift_cols(B_full, -(wsz - 1))             # B[x+wsz-1] at row x
        e = jnp.exp(a + b - logZ[None, :])
        # valid for 1 <= x <= n-wsz+1; row 0 unused
        return jnp.pad(e, ((0, 1), (0, 0)))[:Np]

    ext_w = exterior(w)
    ext_w1 = exterior(w + 1)

    # ---- hairpin ----------------------------------------------------------
    # Cell (i, j) lives at [jc = j-1][ecell = j-i-1] and covers windows
    # x in [i+1, j-w]. With offset o = j - x in [w, min(e-1, W-?)]:
    #   total[x] = sum_o SS[x+o-1][o],  SS[c][k] = sum_{e >= k} HP[c][e]
    # (bounded nonnegative sums — no cumsum cancellation, f32-safe).
    HP = bse * g.hpW  # cell (i, j) at [jc = j-1][ecell = j-i-1]
    SS = jnp.cumsum(HP[:, :, ::-1], axis=2)[:, :, ::-1]  # suffix over span
    hp_b = jnp.zeros((Np, HP.shape[1]), dtype)
    hp_c = jnp.zeros((Np, HP.shape[1]), dtype)
    for o in range(w, band - 1):
        term = jnp.pad(_shift_cols(SS[:, :, o], -(o - 1)),
                       ((0, 1), (0, 0)))[:Np]
        hp_b = hp_b + term
        if o > w:
            hp_c = hp_c + term

    # ---- multiloop --------------------------------------------------------
    def multi_prob(wsz):
        sigf = dtype(np.exp(-wsz * t.lsig))
        part = jnp.zeros((n_max + 1, stem.shape[1]), dtype)
        for tt in range(wsz, band):
            prod = b_multi[:, :, tt] * multi[:, :, tt - wsz]
            part = part + _shift_cols(prod, 1 - tt)
        for tt in range(0, W - wsz + 1):
            prod = _shift_cols(b_multi2[:, :, tt + wsz], -(wsz - 1)) * \
                _shift_cols(multi2[:, :, tt], 1)
            part = part + prod
        return jnp.pad(part * sigf, ((0, 1), (0, 0)))[:Np]

    mp_w = multi_prob(w)
    mp_w1 = multi_prob(w + 1)

    # ---- bulge/internal ("biloop") ---------------------------------------
    # Per-(u1)/(u2) reduced contributions are collected into srcL[u1]
    # (indexed by the outer cell's left end i) and srcR[u2] (indexed by jc),
    # then spread over their bounded windows with nonnegative suffix-sum
    # shifts (f32-safe; see linear_ref for the window derivations).
    _lm = _linmodel(band - 2)
    KInt = np.zeros((2 * ML + 1, ML + 1))
    for r in range(2 * ML + 1):
        for u2 in range(ML + 1):
            if 0 <= r - u2 <= ML:
                KInt[r, u2] = _lm.K_int[r - u2, u2]
    Kb = _lm.K_bulge

    D_bse_m = _diag_view(bse_m, band)
    D_bse_a = _diag_view(bse_a, band)
    D_sm = _diag_view(stem_m, band)
    D_sa = _diag_view(stem_a, band)

    nrows = bse.shape[0]
    zrow = jnp.zeros((nrows, bse.shape[1]), dtype)
    srcL = {u: zrow for u in range(ML + 1)}
    srcR = {u: zrow for u in range(ML + 1)}

    # general interior, right side (per u2)
    for u2 in range(1, ML + 1):
        if u2 < w:
            continue
        KMat = np.zeros((band, band))
        for u1 in range(1, ML - u2 + 1):
            idx = np.arange(band - u1)
            KMat[idx, idx + u1] = KInt[u1 + u2, u2]
        H = jnp.einsum("cbe,et->cbt", stem_m, jnp.asarray(KMat, dtype),
                       preferred_element_type=dtype)
        Hs = _shift_cols(_shift_d(H, u2), u2)
        srcR[u2] = srcR[u2] + jnp.sum(bse_m * Hs, axis=2)

    # general interior, left side (per u1)
    for u1 in range(1, ML + 1):
        if u1 < w:
            continue
        KMat = np.zeros((band, band))
        for u2 in range(1, ML - u1 + 1):
            idx = np.arange(band - u2)
            KMat[idx, idx + u2] = KInt[u1 + u2, u2]
        G = jnp.einsum("cbe,et->cbt", D_sm, jnp.asarray(KMat, dtype),
                       preferred_element_type=dtype)
        Gs = _shift_cols(_shift_d(G, u1), -u1)
        srcL[u1] = srcL[u1] + jnp.sum(D_bse_m * Gs, axis=2)

    # bulges
    for u in range(max(2, w), ML + 1):
        srcL[u] = srcL[u] + jnp.sum(
            D_bse_a * _shift_cols(_shift_d(D_sa, u), -u), axis=2) * \
            dtype(Kb[u])
        srcR[u] = srcR[u] + jnp.sum(
            bse_a * _shift_cols(_shift_d(stem_a, u), u), axis=2) * \
            dtype(Kb[u])

    # small-loop specials spread only when their u reaches w (w <= 2)
    specials = [(1, 0, pg.pb10), (0, 1, pg.pb01), (1, 1, pg.pb11),
                (1, 2, pg.pb12), (2, 1, pg.pb21), (2, 2, pg.pb22)]
    for u1, u2, wgrid in specials:
        if u1 < w and u2 < w:
            continue
        cell = bse * wgrid * _shift_cols(_shift_d(stem, u1 + u2), u2)
        if u2 >= w:
            srcR[u2] = srcR[u2] + jnp.sum(cell, axis=2)
        if u1 >= w:
            srcL[u1] = srcL[u1] + jnp.sum(_diag_view(cell, band), axis=2)

    def padx(a):
        return jnp.pad(a, ((0, 1), (0, 0)))[:Np]

    # boundaries: left x = i + u1 + 1 - w ; right x = jc + 1 - w
    bnd_b = xarr()
    for u in range(w, ML + 1):
        bnd_b = bnd_b + padx(_shift_cols(srcL[u], u + 1 - w))
    sumR = zrow
    for u in range(w, ML + 1):
        sumR = sumR + srcR[u]
    bnd_b = bnd_b + padx(_shift_cols(sumR, -(w - 1)))

    # conditional windows: left x = i + tshift (u1 >= tshift + w);
    # right x = jc + 1 - tau (u2 >= tau, tau >= w + 1)
    bi_c = xarr()
    run = zrow
    for tshift in range(ML - w, 0, -1):
        run = run + srcL[tshift + w]
        bi_c = bi_c + padx(_shift_cols(run, tshift))
    runR = zrow
    for tau in range(ML, w, -1):
        runR = runR + srcR[tau]
        bi_c = bi_c + padx(_shift_cols(runR, -(tau - 1)))

    # Reference linear-branch semantics (raccess.cpp:667-680): the raw
    # (unnormalized) sums are cast to float32 before the log, so values
    # above f32-max collapse to fmath::log(inf) = 128*ln2 — i.e. the
    # normalized probability is clamped at e^(88.72 - logZ). The reference
    # also drops the conditional part when the raw boundary sum is exactly
    # zero; the raw scale is not representable here, so the gate is
    # approximated by "boundary underflows to 0" (deviations are limited to
    # windows whose boundary weight is below ~e^-700 — validated to stay
    # within ~0.05 kcal/mol of the exact engine).
    clamp = jnp.exp(dtype(128.0 * np.float32(np.log(2.0))) -
                    logZ[None, :]).astype(dtype)
    bi_b = jnp.where(bnd_b > 0, jnp.minimum(bnd_b + bi_c, clamp), 0.0)
    bi_c = jnp.minimum(bi_c, clamp)

    return ext_w, ext_w1, hp_b, hp_c, bi_b, bi_c, mp_w, mp_w1


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _run_batch_impl(w_span: int, min_acc_len: int, n_max: int, dtype_name: str,
                    use_pallas: bool,
                    s_padded: jax.Array, lengths: jax.Array):
    dtype = jnp.dtype(dtype_name).type
    band = w_span + 2
    w = min_acc_len
    B = s_padded.shape[0]

    t = make_tables(w_span, dtype=jnp.dtype(dtype_name))
    g = make_grids(t, s_padded, lengths, n_max, band, dtype)
    del use_pallas  # retained in the signature for cache-key stability
    ins = inside_pass(t, g, n_max, band, B, dtype)
    stem, stem_m, stem_a, multi, multi1, multi2, A_cols = ins
    A_full = A_cols  # [N+1, B]
    logZ = jnp.take_along_axis(A_full, lengths[None, :], axis=0)[0]

    B_full = b_outer_scan(stem, g.ext_dot, n_max, band, B, dtype, lengths)
    og = make_outside_grids(t, s_padded, lengths, n_max, band, dtype, g,
                            multi2, A_full, B_full, logZ)
    outs = outside_pass(t, og, multi1, n_max, band, B, dtype)

    pg = make_prob_grids(t, s_padded, n_max, band, dtype)
    (ext_w, ext_w1, hp_b, hp_c, bi_b, bi_c, mp_w, mp_w1) = probability_pass(
        t, g, pg, ins, outs, A_full, B_full, logZ, w, n_max, band, dtype)

    kT = dtype(t.kT)
    p_w = ext_w + hp_b + bi_b + mp_w          # [N+2, B], row = window start x
    p_w1 = ext_w1 + hp_c + bi_c + mp_w1

    xs = jnp.arange(n_max + 2)[:, None]
    nvec = lengths[None, :]
    val_w = (xs >= 1) & (xs + w - 1 <= nvec)
    val_w1 = (xs >= 1) & (xs + w <= nvec)

    logp_w = jnp.log(jnp.maximum(p_w, jnp.finfo(jnp.float32).tiny)
                     .astype(jnp.float32))
    logp_w1 = jnp.log(jnp.maximum(p_w1, jnp.finfo(jnp.float32).tiny)
                      .astype(jnp.float32))
    acc_x = jnp.where(val_w, (-logp_w * jnp.float32(kT)) / 1000, 0.0)
    cond_x = jnp.where(
        val_w1, (-logp_w1 * jnp.float32(kT)) / 1000 - acc_x, 0.0)

    # acc[x-1] = acc_x[x]; cond[x+w-1] = cond_x[x]
    acc = jnp.transpose(acc_x[1 : n_max + 1])            # [B, N]
    cond = jnp.transpose(
        _shift_cols(cond_x, w)[1 : n_max + 1])
    return acc.astype(jnp.float32), cond.astype(jnp.float32)




def _enable_compile_cache() -> None:
    """Persistent compilation cache: the DP programs are large (~1-10 min
    TPU compiles); caching makes warm starts instant across processes."""
    from priblast_tpu.utils import jaxcache

    jaxcache.enable()


class BatchedRaccess:
    """Public entry: accessibility for batches of equal-padded sequences.

    With a mesh, the batch dimension is sharded over it (data parallel:
    base pairs never span sequences, so shards are independent; the
    TPU-native replacement for the reference's per-rank sequence
    distribution, src/fastafile_reader.cpp:135-314)."""

    def __init__(self, w_span: int, min_acc_len: int, dtype="float32",
                 mesh=None):
        # The round-2/3 experimental Pallas scan kernels were REMOVED in
        # round 4: they never compiled at the production (128, 1024) shape
        # (Mosaic scoped-VMEM OOM, 16.69M > 16M) and only tied the XLA
        # scan where they did, at ~970 s compile cost (NOTES.md). A future
        # Pallas attempt should stream per-column grids through a
        # (B-block, column) grid with the carry in VMEM scratch rather
        # than holding whole [B, N, band] blocks.
        self.w = w_span
        self.d = min_acc_len
        self.dtype = dtype
        self.mesh = mesh
        self.use_pallas = False

    def run(self, codes_batch: np.ndarray, lengths: np.ndarray):
        """codes_batch: [B, n_max] uint8 (0..4, zero padded);
        lengths: [B] int. Returns (acc, cond) float32 [B, n_max] with the
        same layout as the exact engine (acc valid [0, n-d], cond valid
        [d, n-1])."""
        _enable_compile_cache()
        from priblast_tpu.parallel import dist

        B, n_max = codes_batch.shape
        s = np.zeros((B, n_max + ML + 4), dtype=np.int32)
        s[:, 1 : n_max + 1] = codes_batch
        acc, cond = _run_batch_impl(self.w, self.d, n_max, self.dtype,
                                    self.use_pallas,
                                    dist.put_batch(s, self.mesh),
                                    dist.put_batch(
                                        np.asarray(lengths, np.int32),
                                        self.mesh))
        return np.asarray(acc), np.asarray(cond)
