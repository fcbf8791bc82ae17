"""Batched gapped extension on device (JAX), over flattened buffers.

Reference semantics: src/gapped_extension.cpp:33-319 (mirrored by the
validated native engine, ops/native/search.cc gapped_extend_one). The
reference's pruned stem-candidate list (CheckStemCandidate,
gapped_extension.cpp:213-217) only admits predecessors whose interior loop
size u1+u2 = (i-k-1)+(j-l-1) is <= dropout, so the DP is a *banded*
anti-diagonal sweep: each diagonal L evaluates all cells (i, L-i) as a
vectorized min over the (dropout+1)(dropout+2)/2 static (u1,u2) predecessor
offsets. Offsets are enumerated in the reference's stems-list order
(predecessor diagonal ascending, then k ascending) so first-occurrence
argmin reproduces the reference's strict-< scan tie-breaking exactly.

Fixed-bound formulation: extension is capped at `max_ext` diagonals; hits
still active at the cap are flagged `overflow` and the caller re-runs them
on the host engine (rare — the reference's own dropout rule terminates when
no minimum improves for `dropout` diagonals).

Hits are batched ACROSS queries and db chunks: per-hit base offsets locate
each hit's query/chunk region inside flattened device buffers (see
search/ungapped.py for the packing contract). Traceback runs on device as a
fixed-length scan over the predecessor-link matrix, so only the (short)
base-pair offset lists come back to the host — not the [B, diag, lane] link
matrix itself.

Buffers are diagonal-indexed with a (dropout+2)-row front pad, so the
predecessor window of diagonal L is a single dynamic slice starting at row
L, and in-window row `dropout - s` is static per (u1,u2) combo.
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

BIG = np.int32(10_000_000)  # "unbounded" boundary sentinel (reference
#                             MAX_EXTENSION, gapped_extension.cpp:30)


@functools.lru_cache(maxsize=1)
def _tables_np():
    r = thermo.RAW
    f = lambda x: np.asarray(x, np.float64).reshape(-1)
    return dict(
        bp=r.BP_pair.reshape(-1).astype(np.int32),
        rtype=r.rtype.astype(np.int32),
        stack=f(r.stack37),
        bulge=f(r.bulge37),
        i11=f(r.int11_37),
        i21=f(r.int21_37),
        i22=f(r.int22_37),
        mismI=f(r.mismatchI37),
        intloop=f(r.internal_loop37),
        lxc=np.float64(thermo.RAW.lxc37),
        term_au=np.float64(thermo.RAW.TerminalAU),
    )


def _wob(t):
    # wobble pair types (reference: gapped_extension.cpp:340)
    return (t == 3) | (t == 4)


def _sr(x, n: int, fill):
    """Static right-shift along the last axis (shift predecessor lanes);
    saturates to all-fill when the shift covers the whole width (possible
    when max_ext < dropout + 1)."""
    if n == 0:
        return x
    if n >= x.shape[-1]:
        return jnp.full(x.shape, fill, x.dtype)
    pad = jnp.full(x.shape[:-1] + (n,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., : x.shape[-1] - n]], axis=-1)


def _loop_e(t, dtype, u1: int, u2: int, ta, tb, a, b, c, dch):
    """Gapped loop energy for a static (u1, u2) offset (reference:
    gapped_extension.cpp:426-473; native loop37_gapped). Only the branch
    selected by (u1, u2) is traced."""
    if u1 == 0 and u2 == 0:
        z = t["stack"][ta * 7 + tb]
    elif u1 == 0 or u2 == 0:
        u = u1 + u2
        if u <= 30:
            zb = t["bulge"][u]
        else:
            zb = t["bulge"][30] + t["lxc"] * np.log(u / 30.0)
        if u == 1:
            z = zb + t["stack"][ta * 7 + tb]
        else:
            z = (zb + jnp.where(ta > 2, t["term_au"], 0.0)
                 + jnp.where(tb > 2, t["term_au"], 0.0))
    elif u1 == 1 and u2 == 1:
        z = t["i11"][((ta * 8 + tb) * 5 + a) * 5 + b]
    elif u1 == 1 and u2 == 2:
        z = t["i21"][(((ta * 8 + tb) * 5 + a) * 5 + dch) * 5 + b]
    elif u1 == 2 and u2 == 1:
        z = t["i21"][(((tb * 8 + ta) * 5 + dch) * 5 + a) * 5 + c]
    elif u1 == 2 and u2 == 2:
        z = t["i22"][((((ta * 8 + tb) * 5 + a) * 5 + c) * 5 + dch) * 5 + b]
    else:
        z = (t["intloop"][min(u1 + u2, 30)]
             + t["mismI"][(ta * 5 + a) * 5 + b]
             + t["mismI"][(tb * 5 + dch) * 5 + c])
    return (z / 100.0).astype(dtype)


def _gather_chars(seq, start, sign: int, xw: int):
    """raw[b, x] = seq[start_b + sign*x], 0 outside bounds; and the GetChar
    mapping (reference: gapped_extension.cpp:401-407)."""
    n = seq.shape[0]
    x = jnp.arange(xw, dtype=jnp.int32)
    pos = start[:, None] + sign * x[None, :]
    oob = (pos < 0) | (pos >= n)
    raw = jnp.where(oob, 0, seq[jnp.clip(pos, 0, n - 1)]).astype(jnp.int32)
    mapped = jnp.where(raw < 2, 0, jnp.where(raw <= 5, raw - 1, raw - 5))
    return raw, mapped.astype(jnp.int32)


def _take(arr2d, idx):
    """arr2d[b, idx[b]] with clipping."""
    return jnp.take_along_axis(
        arr2d, jnp.clip(idx, 0, arr2d.shape[1] - 1)[:, None], axis=1)[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("flag", "d", "dropout", "min_helix",
                                    "max_ext", "dtype"))
def gapped_extend_device(q_start, db_start, id_anchor, energy0, acc0,
                         valid, qb, qab, dbb, aoff, coff,
                         q_enc, db_seq, q_acc, q_cond,
                         db_acc, db_cond, *, flag: int,
                         d: int, dropout: int, min_helix: int, max_ext: int,
                         dtype: str = "float32"):
    """One direction (flag 0 = left, 1 = right) of the gapped extension for
    a batch of hits over flattened buffers.

    q_start/db_start: the fixed extension origins in query-local /
    chunk-local coordinates (reference gapped_extension.cpp:88-98 — flag 0:
    hit start points; flag 1: hit end points). id_anchor: db-accessibility
    anchor (flag 0: dbseq_start + db_len - 1; flag 1: dbseq_start).
    energy0/acc0: the hit's current total and accessibility energies.
    qb/qab/dbb: per-hit base offsets into the flat encoded-query, flat
    query-accessibility and flat db-sequence buffers; aoff/coff: absolute
    offsets of the hit's db sequence's accessibility arrays. Returns
    per-hit argmin extension amounts (min_i on the query side, min_j on the
    db side; 0 = no improvement), updated energies, the traceback offset
    lists (tb_i/tb_j, in reference push order, 0-terminated), and an
    `overflow` flag for hits that were still active at max_ext.
    """
    dt = jnp.float64 if dtype == "float64" else jnp.float32
    t = {k: (jnp.asarray(v, dt) if np.asarray(v).dtype == np.float64
             else jnp.asarray(v))
         for k, v in _tables_np().items()}
    bp, rt = t["bp"], t["rtype"]
    B = q_start.shape[0]
    W = max_ext               # lane i of a diagonal row
    OFF = dropout + 2         # diag D lives at buffer row D + OFF
    DD = max_ext + OFF + 1
    XW = max_ext + min_helix  # char/prefix arrays cover offsets 0..XW-1
    INF = jnp.asarray(np.inf, dt)
    sign = -1 if flag == 0 else 1

    # --- per-hit precomputation (offset-indexed views of both sequences)
    q_raw, qm = _gather_chars(q_enc, qb + q_start, sign, XW)
    db_raw, dm = _gather_chars(db_seq, dbb + db_start, sign, XW)

    # boundary offsets (reference: gapped_extension.cpp:111-134); the first
    # blocked offset >= 1 bounds the extension at that offset - 1
    def max_ext_of(raw):
        blocked = raw[:, 1:] < 2
        first = jnp.argmax(blocked, axis=1).astype(jnp.int32) + 1
        return jnp.where(jnp.any(blocked, axis=1), first - 1, BIG)

    maxq = max_ext_of(q_raw)
    maxd = max_ext_of(db_raw)

    # prefix accessibility arrays, extq[x] / extdb[x] = energy of extending
    # x positions (reference: gapped_extension.cpp:156-212). The length-1
    # entry is computed in float32 and widened, as in the reference.
    x1 = jnp.arange(XW, dtype=jnp.int32)
    nq = q_acc.shape[0]
    aoff = aoff.astype(jnp.int32)
    coff = coff.astype(jnp.int32)
    nda, ndc = db_acc.shape[0], db_cond.shape[0]

    def g1(arr, idx, size):
        return arr[jnp.clip(idx, 0, size - 1)]

    def inc3(a_, b_, c_):
        # a - b + c: the reference evaluates the length-1 entry fully in
        # float32 and widens; later entries chain in double
        # (gapped_extension.cpp:156-212 and the native mirror's comment)
        full = a_.astype(dt) - b_.astype(dt) + c_.astype(dt)
        f32 = (a_ - b_ + c_).astype(dt)
        return full.at[:, 1].set(f32[:, 1])

    if flag == 0:
        posq = (qab + q_start)[:, None] - x1[None, :]
        incq = inc3(g1(q_acc, posq, nq), g1(q_acc, posq + 1, nq),
                    g1(q_cond, posq + d, nq))
        incdb = g1(db_cond, coff[:, None] + id_anchor[:, None] + x1[None, :],
                   ndc).astype(dt)
    else:
        incq = g1(q_cond, (qab + q_start)[:, None] + x1[None, :],
                  nq).astype(dt)
        posd = aoff[:, None] + id_anchor[:, None] - x1[None, :]
        posc = coff[:, None] + id_anchor[:, None] - x1[None, :]
        incdb = inc3(g1(db_acc, posd, nda), g1(db_acc, posd + 1, nda),
                     g1(db_cond, posc + d, ndc))
    zero_first = jnp.zeros((B, 1), dt)
    extq = jnp.concatenate([zero_first, jnp.cumsum(incq[:, 1:], axis=1)], 1)
    extdb = jnp.concatenate([zero_first, jnp.cumsum(incdb[:, 1:], axis=1)], 1)

    # reversed+padded views for db-side per-diagonal windows: row slices of
    # rev(arr) starting at XW-1-L+u give vector arr[L - i - u] over lanes i
    pad_r = dropout + min_helix + W + 2

    def revpad(arr, fill):
        return jnp.concatenate(
            [arr[:, ::-1],
             jnp.full((B, pad_r), fill, arr.dtype)], axis=1)

    dmr = revpad(dm, 0)
    extdbr = revpad(extdb, INF)
    # one-left-padded view for the +1-offset char of the row being written
    # (dm[L - k + 1] needs rev index rev0 - 1, which is -1 at L = XW - 1)
    dmr1 = jnp.concatenate([jnp.zeros((B, 1), dmr.dtype), dmr], axis=1)

    def dslice(arr, start, width=W):
        start = jnp.asarray(start, jnp.int32)
        return lax.dynamic_slice(arr, (jnp.asarray(0, jnp.int32), start),
                                 (B, width))

    # static cell-side char vectors (indexed by lane i)
    qm_i = qm[:, :W]
    qm_im1 = _sr(qm_i, 1, 0)
    qm_hx = [qm[:, x:x + W] for x in range(1, min_helix)]
    extq_i = extq[:, :W]
    i_lane = jnp.arange(W, dtype=jnp.int32)

    # origin cell (reference: gapped_extension.cpp:116-127): diag 0, lane 0
    oq = _take(qm, jnp.zeros(B, jnp.int32))
    od = _take(dm, jnp.zeros(B, jnp.int32))
    otype = bp[oq * 5 + od]
    if flag == 0:
        otype = rt[otype]
    origin_row = jnp.zeros((B, W), jnp.int32).at[:, 0].set(otype)
    o_adm = jnp.zeros((B, W), bool).at[:, 0].set(valid)

    # per-cell mismatch-table value, precomputed when a diagonal row is
    # written and stored alongside the DP state: the interior-loop mismatch
    # term mismI[pred_type, ·, ·] of a predecessor cell (diag D, lane k)
    # depends only on that cell (chars qm[k+1], dm[D-k+1]), so computing it
    # once per row replaces a [B, C, W] irregular-index gather per step
    # with one [B, W] gather (reference term: gapped_extension.cpp:426-473
    # internal-loop mismatch factors)
    qp1 = qm[:, 1:W + 1]

    def mism_row(st_row, dmp1):
        if flag == 0:
            return t["mismI"][(st_row * 5 + dmp1) * 5 + qp1]
        return t["mismI"][(st_row * 5 + qp1) * 5 + dmp1]

    v_origin = mism_row(origin_row, dslice(dmr1, XW - 1))

    hyb_buf = jnp.full((B, DD, W), INF, dt).at[:, OFF, 0].set(
        energy0.astype(dt))
    st_buf = jnp.zeros((B, DD, W), jnp.int32).at[:, OFF, :].set(origin_row)
    mt_buf = jnp.zeros((B, DD, W), jnp.int32).at[:, OFF, :].set(origin_row)
    adm_buf = jnp.zeros((B, DD, W), bool).at[:, OFF, :].set(o_adm)
    pred_buf = jnp.full((B, DD, W), -1, jnp.int32)
    vm_buf = jnp.zeros((B, DD, W), dt).at[:, OFF, :].set(v_origin)

    # (u1, u2) predecessor offsets in the reference's stems-list order
    # (pred diagonal ascending = s descending, then k ascending = u1
    # descending); first-occurrence argmin over this axis reproduces the
    # reference's strict-< stems scan tie-breaking.
    combos = [(s, u1) for s in range(dropout, -1, -1)
              for u1 in range(s, -1, -1)]
    C = len(combos)
    u1_np = np.array([u1 for _, u1 in combos], np.int32)
    u2_np = np.array([s - u1 for s, u1 in combos], np.int32)
    s_np = u1_np + u2_np

    # combo classes and per-combo constants (raw table units). Combos whose
    # energy is not "intloop + shared mismatch + predecessor mismatch" are
    # patched individually: the 4 small-internal specials, the 2 size-1
    # bulges and the stack combo (all with per-combo [B, W] table lookups).
    r_np = _tables_np()
    is_bulge = (u1_np == 0) ^ (u2_np == 0)
    is_bN = is_bulge & (s_np >= 2)
    spec_idx = [ci for ci, (s, u1) in enumerate(combos)
                if (u1, s - u1) in ((1, 1), (1, 2), (2, 1), (2, 2))]
    stk_idx = [ci for ci, (s, u1) in enumerate(combos) if s <= 1]
    bconst_np = np.zeros(C)
    for ci in range(C):
        s = int(s_np[ci])
        if is_bulge[ci]:
            bconst_np[ci] = (r_np["bulge"][s] if s <= 30 else
                             r_np["bulge"][30] + r_np["lxc"] * np.log(s / 30.))
    iconst_np = r_np["intloop"][np.minimum(s_np, 30)]

    def c1(x, dtype_):  # [1, C, 1] constant
        return jnp.asarray(np.asarray(x).reshape(1, C, 1), dtype_)

    bconst = c1(bconst_np, dt)
    iconst = c1(iconst_np, dt)
    m_bN = c1(is_bN, bool)
    u1_c = jnp.asarray(u1_np)
    u2_c = jnp.asarray(u2_np)
    TAU = t["term_au"]

    def body(st):
        L = st["L"]
        active = st["active"]
        z0 = jnp.asarray(0, L.dtype)

        # rows 0..dropout = predecessor diagonals L-2-dropout..L-2 (the
        # pruned stems window); row dropout+1 = diag L-1 (fallback scan only)
        win_h = lax.dynamic_slice(st["hyb"], (z0, L, z0), (B, dropout + 2, W))
        win_s = lax.dynamic_slice(st["st"], (z0, L, z0), (B, dropout + 2, W))
        win_a = lax.dynamic_slice(st["adm"], (z0, L, z0), (B, dropout + 2, W))
        win_m = lax.dynamic_slice(st["mt"], (z0, L, z0), (B, dropout + 2, W))
        win_v = lax.dynamic_slice(st["vm"], (z0, L, z0), (B, dropout + 2, W))

        # stems[0] fallback: when a cell has no finite predecessor the
        # reference records stems[0] (first surviving stem) in the cell
        # (gapped_extension.cpp:230-258, min_k initialized to 0); its type
        # feeds later helix-gate reads. First admitted cell in (diag, k)
        # order over the surviving window.
        adm_flat = win_a.reshape(B, -1)
        first_idx = jnp.argmax(adm_flat, axis=1)
        stem0_type = jnp.where(
            jnp.any(adm_flat, axis=1),
            jnp.take_along_axis(win_s.reshape(B, -1), first_idx[:, None],
                                axis=1)[:, 0], 0)

        rev0 = XW - 1 - L  # slice start for u = 0
        dm_t = dslice(dmr, rev0)           # dm[L-i]   (cell db char)
        dm_b = dslice(dmr, rev0 + 1)       # dm[L-i-1] (interior b char)
        extdb_j = dslice(extdbr, rev0)     # extdb[L-i]

        # --- helix/wobble admission (reference: gapped_extension.cpp:342-364)
        t0 = bp[qm_i * 5 + dm_t]
        if flag == 1:
            t0 = rt[t0]
        prev_mt = _sr(win_m[:, dropout, :], 1, 0)  # m[i-1][j-1].type
        gate = (prev_mt == 0) | (_wob(t0) & _wob(prev_mt))
        bad = jnp.zeros((B, W), bool)
        for xi, x in enumerate(range(1, min_helix)):
            tx = bp[qm_hx[xi] * 5 + dslice(dmr, rev0 - x)]
            if flag == 1:
                tx = rt[tx]
            zx = tx == 0
            if x == 1:
                zx = zx | (_wob(t0) & _wob(tx))
            bad = bad | zx
        type1 = jnp.where(gate & bad, 0, t0)

        j_lane = L - i_lane
        cellmask = (active[:, None] & (i_lane >= 1)[None, :]
                    & (i_lane <= L - 1)[None, :]
                    & (i_lane[None, :] <= maxq[:, None])
                    & (j_lane[None, :] <= maxd[:, None]))
        adm_new = cellmask & (type1 != 0)

        # --- predecessor window min over the combo axis (stems-list order).
        # Combo (s, u1)'s predecessor values live at window row dropout - s,
        # lane i - u1 - 1: a STATIC row index and a STATIC lane shift, so
        # the [B, C, W] predecessor tensors are stacks of shifted row views
        # (full-bandwidth copies) instead of irregular-index gathers — the
        # gathers were the measured on-chip bottleneck (NOTES.md round 3).
        def shifted(win, fill):
            return jnp.stack([_sr(win[:, dropout - s, :], u1 + 1, fill)
                              for (s, u1) in combos], axis=1)

        ph_all = shifted(win_h, INF)
        pt_all = shifted(win_s, 0)
        pa_all = shifted(win_a, False)   # shift-in False == k >= 0 mask
        vm_all = shifted(win_v, jnp.asarray(0, dt))

        t1b = type1[:, None, :]
        if flag == 0:
            mism_shared = t["mismI"][(type1 * 5 + qm_im1) * 5 + dm_b]
        else:
            mism_shared = t["mismI"][(type1 * 5 + dm_b) * 5 + qm_im1]
        # general internal loop: length const + shared mismatch (current
        # cell) + predecessor-cell mismatch (precomputed row value)
        E = iconst + mism_shared[:, None, :] + vm_all
        au_term = (jnp.where(t1b > 2, TAU, jnp.asarray(0, dt))
                   + jnp.where(pt_all > 2, TAU, jnp.asarray(0, dt)))
        E = jnp.where(m_bN, bconst + au_term, E)
        # stack (s=0) and size-1 bulges (s=1): stack37[t1, pt] lookups on
        # just those combos
        for ci in stk_idx:
            s, _u1 = combos[ci]
            pt_r = pt_all[:, ci, :]
            stk = (t["stack"][type1 * 7 + pt_r] if flag == 0
                   else t["stack"][pt_r * 7 + type1])
            e_ci = stk if s == 0 else jnp.asarray(r_np["bulge"][1], dt) + stk
            E = E.at[:, ci, :].set(e_ci)
        E = E / 100.0
        for ci in spec_idx:
            s, u1 = combos[ci]
            u2 = s - u1
            pt_r = pt_all[:, ci, :]
            cq_r = _sr(qm_i, u1, 0)               # qm[i - u1] = qm[k + 1]
            dd_r = dslice(dmr, rev0 + u2)         # dm[L - i - u2] = dm[l + 1]
            if flag == 0:
                ta, tb, a, b, c, dch = type1, pt_r, qm_im1, dm_b, cq_r, dd_r
            else:
                ta, tb, a, b, c, dch = pt_r, type1, cq_r, dd_r, qm_im1, dm_b
            E = E.at[:, ci, :].set(
                _loop_e(t, dt, u1, u2, ta, tb, a, b, c, dch))
        Et = jnp.where(pa_all, E.astype(dt) + ph_all, INF)
        hyb = jnp.min(Et, axis=1)
        arg = jnp.argmin(Et, axis=1).astype(jnp.int32)  # first = stems order
        au1 = u1_c[arg]
        au2 = u2_c[arg]
        k_pred = i_lane[None, :] - au1 - 1
        l_pred = j_lane[None, :] - au2 - 1
        ptype = jnp.take_along_axis(pt_all, arg[:, None, :], axis=1)[:, 0]
        # no finite predecessor -> reference keeps stems[0]
        nopred = jnp.isinf(hyb)
        ptype = jnp.where(nopred, stem0_type[:, None], ptype)
        packed = jnp.where(nopred, 0, k_pred * (max_ext + 1) + l_pred)

        hyb_row = jnp.where(adm_new, hyb, INF)
        st_row = jnp.where(adm_new, rt[type1], 0)
        mt_row = jnp.where(adm_new, ptype, 0)
        pr_row = jnp.where(adm_new, packed, -1)
        vm_row = mism_row(st_row, dslice(dmr1, rev0))

        def upd(buf, row):
            return lax.dynamic_update_slice(buf, row[:, None, :],
                                            (z0, L + OFF, z0))

        # --- running minimum (reference: gapped_extension.cpp:259-276)
        inter = jnp.where(adm_new, extq_i + extdb_j + hyb, INF)
        dmin = jnp.min(inter, axis=1)
        darg = jnp.argmin(inter, axis=1).astype(jnp.int32)
        improve = active & (dmin < st["min_e"])
        min_e = jnp.where(improve, dmin, st["min_e"])
        min_i = jnp.where(improve, darg, st["min_i"])
        min_j = jnp.where(improve, L - darg, st["min_j"])
        min_len = jnp.where(improve, L, st["min_len"])
        acc_new = acc0.astype(dt) + _take(extq, darg) + _take(extdb, L - darg)
        min_a = jnp.where(improve, acc_new, st["min_a"])

        # --- termination (reference: gapped_extension.cpp:292-297): dropout
        # window exhausted, or both boundaries known
        stop = ((L - min_len >= dropout)
                | ((L > maxq) & (L > maxd)))
        ovf = st["ovf"] | (active & ~stop & (L >= max_ext))
        active = active & ~stop & (L < max_ext)

        return dict(L=L + 1, active=active, ovf=ovf,
                    min_e=min_e, min_i=min_i, min_j=min_j, min_len=min_len,
                    min_a=min_a,
                    hyb=upd(st["hyb"], hyb_row), st=upd(st["st"], st_row),
                    mt=upd(st["mt"], mt_row), adm=upd(st["adm"], adm_new),
                    pred=upd(st["pred"], pr_row), vm=upd(st["vm"], vm_row))

    st = dict(L=jnp.asarray(1, jnp.int32), active=valid,
              ovf=jnp.zeros(B, bool),
              min_e=energy0.astype(dt), min_i=jnp.zeros(B, jnp.int32),
              min_j=jnp.zeros(B, jnp.int32), min_len=jnp.zeros(B, jnp.int32),
              min_a=acc0.astype(dt),
              hyb=hyb_buf, st=st_buf, mt=mt_buf, adm=adm_buf, pred=pred_buf,
              vm=vm_buf)
    st = lax.while_loop(lambda s: jnp.any(s["active"]), body, st)

    # --- device traceback (reference: gapped_extension.cpp:409-424): walk
    # the predecessor links from (min_i, min_j); every step decreases the
    # diagonal by >= 2, so max_ext // 2 + 1 steps always reach the origin.
    # Emitted (ti, tj) offset pairs are in reference push order.
    pred_flat = st["pred"].reshape(B, DD * W)

    def tb_step(carry, _):
        ti, tj = carry
        live = (ti != 0) & (tj != 0)
        packed = jnp.take_along_axis(
            pred_flat, ((ti + tj + OFF) * W + ti)[:, None], axis=1)[:, 0]
        packed = jnp.maximum(packed, 0)
        nti = jnp.where(live, packed // (max_ext + 1), 0)
        ntj = jnp.where(live, packed % (max_ext + 1), 0)
        return (nti.astype(jnp.int32), ntj.astype(jnp.int32)), \
            (jnp.where(live, ti, 0), jnp.where(live, tj, 0))

    (_, _), (tb_i, tb_j) = lax.scan(tb_step, (st["min_i"], st["min_j"]),
                                    None, length=max_ext // 2 + 1)
    return dict(min_i=st["min_i"], min_j=st["min_j"], min_e=st["min_e"],
                min_a=st["min_a"], overflow=st["ovf"],
                tb_i=tb_i.T, tb_j=tb_j.T)


def gapped_extend_flat_batch(hits, qbufs, dbufs, *, d: int,
                             dropout: int, min_helix: int, max_ext: int = 64,
                             dtype: str = "float32",
                             pad_to: int | None = None, mesh=None):
    """Both extension directions for a hit batch (SoA numpy dict carrying
    per-hit base offsets qb/qab/dbb/aoff/coff), device DP + device
    traceback. Returns (updated hit dict, bp dict, overflow mask). The bp
    dict holds the gapped base pairs in reference push order as flattened
    arrays: n0/q0/db0 for the left extension (per-hit counts + coords) and
    n1/q1/db1 for the right. Hits flagged overflow are NOT extended here —
    the caller must re-run them on the host engine from their pre-extension
    state.

    qbufs = (q_enc_flat, q_acc_flat, q_cond_flat) and dbufs = (db_seq_flat,
    db_acc_flat, db_cond_flat) are jnp device copies; reference:
    gapped_extension.cpp:41-67.
    """
    n = len(hits["q_sp"])
    B = pad_to or max(8, 1 << (n - 1).bit_length())
    assert B >= n

    def pad(a, dtype_, fill=0):
        out = np.full(B, fill, dtype_)
        out[:n] = a
        return out

    def put(a):
        from priblast_tpu.parallel import dist

        return dist.put_batch(a, mesh)

    q_sp = pad(hits["q_sp"], np.int32)
    db_sp = pad(hits["db_sp"], np.int32)
    q_len = pad(hits["q_len"], np.int32, 1)
    db_len = pad(hits["db_len"], np.int32, 1)
    ids = pad(hits["dbseq_start"], np.int32)
    energy = pad(hits["energy"], np.float64)
    acc_e = pad(hits["acc_e"], np.float64)
    bases = [put(pad(hits[k], np.int32))
             for k in ("qb", "qab", "dbb", "aoff", "coff")]
    valid = np.zeros(B, bool)
    valid[:n] = True

    kw = dict(d=d, dropout=dropout, min_helix=min_helix, max_ext=max_ext,
              dtype=dtype)
    # kernel buffer order: q_enc, db_seq, q_acc, q_cond, db_acc, db_cond
    seqs = (qbufs[0], dbufs[0], qbufs[1], qbufs[2], dbufs[1], dbufs[2])

    def coords(r, q0, db0, sgn):
        """Vectorized traceback coordinates in push order."""
        tb_i = np.asarray(r["tb_i"])[:n]
        tb_j = np.asarray(r["tb_j"])[:n]
        mask = (tb_i > 0) & (tb_j > 0)
        cq = (q0[:n, None] + sgn * tb_i)[mask]
        cdb = (db0[:n, None] + sgn * tb_j)[mask]
        return dict(n=mask.sum(axis=1).astype(np.int64),
                    q=cq.astype(np.int32), db=cdb.astype(np.int32))

    # ---- left (flag 0)
    r0 = gapped_extend_device(
        put(q_sp), put(db_sp),
        put(ids + db_len - 1), put(energy),
        put(acc_e), put(valid), *bases, *seqs,
        flag=0, **kw)
    bp0 = coords(r0, q_sp, db_sp, -1)
    m_i0 = np.asarray(r0["min_i"])
    m_j0 = np.asarray(r0["min_j"])
    q_sp2 = q_sp - m_i0
    db_sp2 = db_sp - m_j0
    q_len2 = q_len + m_i0
    db_len2 = db_len + m_j0
    e2 = np.asarray(r0["min_e"]).astype(np.float64)
    a2 = np.asarray(r0["min_a"]).astype(np.float64)

    # ---- right (flag 1), from the post-left extents
    r1 = gapped_extend_device(
        put(q_sp2 + q_len2 - 1), put(db_sp2 + db_len2 - 1),
        put(ids), put(e2), put(a2),
        put(valid), *bases, *seqs, flag=1, **kw)
    bp1 = coords(r1, q_sp2 + q_len2 - 1, db_sp2 + db_len2 - 1, 1)
    m_i1 = np.asarray(r1["min_i"])
    m_j1 = np.asarray(r1["min_j"])

    out = dict(hits)
    out["q_sp"] = q_sp2[:n]
    out["db_sp"] = db_sp2[:n]
    out["q_len"] = (q_len2 + m_i1)[:n]
    out["db_len"] = (db_len2 + m_j1)[:n]
    out["dbseq_start"] = (ids - m_j1)[:n]
    out["energy"] = np.asarray(r1["min_e"]).astype(np.float64)[:n]
    out["acc_e"] = np.asarray(r1["min_a"]).astype(np.float64)[:n]
    out["hyb_e"] = out["energy"] - out["acc_e"]
    overflow = (np.asarray(r0["overflow"]) | np.asarray(r1["overflow"]))[:n]
    bps = dict(n0=bp0["n"], q0=bp0["q"], db0=bp0["db"],
               n1=bp1["n"], q1=bp1["q"], db1=bp1["db"])
    return out, bps, overflow
