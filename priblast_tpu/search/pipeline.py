"""Cross-query device search pipeline for the ris step.

The reference's per-(query, db-page) kernel chain
(src/rna_interaction_search.cpp:130-200) is restructured into stages that
batch hits ACROSS every (query, chunk) pair, so the device extension
kernels see a few large lockstep batches instead of thousands of small
calls:

  host   stage 1: seed search + SA-interval expansion, per (query, chunk)
         (native C++, thread pool) -> one global hit stream tagged by group
  device stage 2: ungapped extension over the whole stream (flat buffers)
  host   stage 3: per-group sort + interaction-threshold dedup + seed bps
  device stage 4: gapped extension DP + traceback over the whole stream
  host   stage 5: vectorized base-pair assembly + per-group finish
         (dangles, bp sort, final sort + dedup)

Flat buffers: every query's encoded sequence / accessibility arrays and
every chunk's sequence / accessibility arrays are packed into single device
buffers with one zero pad byte before each region (the pad byte reproduces
the reference's left-boundary stop, since its encodings already carry a
trailing sentinel). Hits carry base offsets into those buffers; hit
coordinates stay query-/chunk-local, as in the reference.

Hit semantics are identical to the exact engine; energies carry the device
dtype's accumulation noise (float64 device math reproduces the host engine
to ~1e-12; float32 to ~1e-4 kcal/mol).
"""

from __future__ import annotations

import concurrent.futures as cf
from dataclasses import dataclass

import numpy as np

from priblast_tpu.ops import native


def _len_bucket(n: int, floor: int = 256) -> int:
    # pow2 buckets so kernel shapes (and compiles) are reused across runs
    return max(floor, 1 << max(n - 1, 1).bit_length())


def _pack_regions(arrays, np_dtype, pad: int = 1, tail: int = 8):
    """Concatenate arrays into one flat buffer with `pad` zero entries
    before each region; returns (flat, bases int64[n])."""
    total = sum(len(a) for a in arrays) + pad * len(arrays) + tail
    flat = np.zeros(_len_bucket(total), np_dtype)
    bases = np.zeros(len(arrays), np.int64)
    pos = 0
    for i, a in enumerate(arrays):
        pos += pad
        bases[i] = pos
        flat[pos: pos + len(a)] = a
        pos += len(a)
    return flat, bases


# Packed gather sources (round 5). Irregular gathers on a v5e cost per
# INDEX (~100 M idx/s 1-wide), but slice-gathers of short contiguous rows
# run ~2x faster per index AND deliver 2-16 elements each (measured:
# /tmp slice-gather bench, w2/w4 at ~200 M idx/s). The fused/uwin
# kernels' per-lane window reads therefore ride row-packed arrays:
# chars as [*, 4]-int32 rows of 32 nibbles, f32 arrays as [*, 4] rows,
# and paired int32 tables as [*, 2] rows. A 32-entry head pad (filled
# with the array's clip-to-zero value, element 0) keeps the packed reads
# equal to the unpacked clipped reads for every position the kernels can
# touch. int64 is deliberately avoided: x64 is off on the TPU path.
_NPAD = 32


def _nibble_pack(flat_i32: np.ndarray) -> np.ndarray:
    """[Nw/4, 4] int32 rows, each row = 32 chars at 4 bits."""
    a = np.concatenate([np.zeros(_NPAD, np.int64),
                        flat_i32.astype(np.int64),
                        np.zeros(_NPAD + 8, np.int64)])
    a = np.concatenate([a, np.zeros((-len(a)) % 32, np.int64)])
    assert int(a.max(initial=0)) < 16 and int(a.min(initial=0)) >= 0
    w = (a.astype(np.uint64) & 15).reshape(-1, 8)
    out = np.zeros(len(w), np.uint64)
    for i in range(8):
        out |= w[:, i] << np.uint64(4 * i)
    return out.astype(np.uint32).view(np.int32).reshape(-1, 4)


def _row4_f32(flat_f32: np.ndarray) -> np.ndarray:
    """[N/4, 4] f32 rows (head pad = element 0, the clip fill)."""
    head = np.full(_NPAD, flat_f32[0] if len(flat_f32) else 0, np.float32)
    a = np.concatenate([head, np.asarray(flat_f32, np.float32),
                        np.zeros(_NPAD + 8, np.float32)])
    a = np.concatenate([a, np.zeros((-len(a)) % 4, np.float32)])
    return a.reshape(-1, 4)


def _pair_rows_i32(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """[N, 2] rows pairing two parallel int32 arrays (one w2 gather)."""
    return np.stack([np.asarray(lo).view(np.int32),
                     np.asarray(hi).view(np.int32)], axis=1)


def _prefix_hilo(arr: np.ndarray):
    """Exclusive prefix sums of a float32 array as a hi/lo float32 pair.

    C[i] = sum(arr[:i]) computed in f64 on the host, split into
    hi = f32(C) and lo = f32(C - hi). Windowed sums become
    (hi[b]-hi[a]) + (lo[b]-lo[a]): nearby hi values differ by a window
    sum (tiny vs their magnitude), so the hi difference is exact
    (Sterbenz), and the lo difference restores the bits the hi split
    dropped — f32-accurate without f64 device arrays (x64 is off on the
    TPU path). Replaces the reference's per-tap accumulation
    (src/seed_search.cpp:143-151) with two point reads."""
    c = np.zeros(len(arr) + 1, np.float64)
    np.cumsum(arr.astype(np.float64), out=c[1:])
    hi = c.astype(np.float32)
    lo = (c - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


class QueryPack:
    """Flat device buffers for a set of queries (encoded + accessibility +
    suffix arrays, for the device seed-expansion stage). With a mesh, the
    buffers are replicated across it (read-only gather sources)."""

    def __init__(self, q_encs, q_accs, q_conds, q_sas=None, mesh=None):
        from priblast_tpu.parallel import dist

        self.mesh = mesh
        enc, self.enc_base = _pack_regions(q_encs, np.int32)
        acc, self.acc_base = _pack_regions(q_accs, np.float32)
        cond, cond_base = _pack_regions(q_conds, np.float32)
        assert np.array_equal(self.acc_base, cond_base)
        self.enc = dist.put_replicated(enc, mesh)
        self.acc = dist.put_replicated(acc, mesh)
        self.cond = dist.put_replicated(cond, mesh)
        # hi/lo split prefix sums of cond for O(1) window-accessibility
        # sums on device without f64 (see _prefix_hilo)
        ph, plo = _prefix_hilo(cond)
        self.cond_pref_hi = dist.put_replicated(ph, mesh)
        self.cond_pref_lo = dist.put_replicated(plo, mesh)
        self.cond_pref2 = dist.put_replicated(
            _pair_rows_i32(ph, plo), mesh)
        # packed gather sources for the windowed-extension kernel
        self.enc_nib = dist.put_replicated(_nibble_pack(enc), mesh)
        self.acc4 = dist.put_replicated(_row4_f32(acc), mesh)
        self.cond4 = dist.put_replicated(_row4_f32(cond), mesh)
        self.sa = None
        if q_sas is not None:
            sa, self.sa_base = _pack_regions(q_sas, np.int32, pad=0)
            self.sa = dist.put_replicated(sa, mesh)

    @property
    def bufs(self):
        return (self.enc, self.acc, self.cond)

    @property
    def bufs6(self):
        return (self.enc, self.acc, self.cond,
                self.enc_nib, self.acc4, self.cond4)


class DbPack:
    """Flat device buffers for all database chunks."""

    def __init__(self, chunks, mesh=None):
        from priblast_tpu.parallel import dist

        self.mesh = mesh
        seq, self.seq_base = _pack_regions([c.seqs for c in chunks],
                                           np.int32)
        acc, self.acc_base = _pack_regions([c.acc for c in chunks],
                                           np.float32, pad=0)
        cond, self.cond_base = _pack_regions([c.cond for c in chunks],
                                             np.float32, pad=0)
        self.seq = dist.put_replicated(seq, mesh)
        self.acc = dist.put_replicated(acc, mesh)
        self.cond = dist.put_replicated(cond, mesh)
        # absolute per-(chunk, seq) accessibility offsets for host lookups
        self.abs_acc_off = [self.acc_base[ci] + c.acc_off
                            for ci, c in enumerate(chunks)]
        self.abs_cond_off = [self.cond_base[ci] + c.cond_off
                             for ci, c in enumerate(chunks)]
        # seed-expansion stage buffers: suffix arrays, per-sequence layout,
        # absolute accessibility offsets (device copies)
        sa, self.sa_base = _pack_regions([c.suffix_array for c in chunks],
                                         np.int32, pad=0)
        spos, self.seq_meta_base = _pack_regions(
            [c.start_pos for c in chunks], np.int32, pad=0)
        slen, slen_base = _pack_regions([c.seq_sizes for c in chunks],
                                        np.int32, pad=0)
        assert np.array_equal(self.seq_meta_base, slen_base)
        aoff, aoff_base = _pack_regions(
            [a.astype(np.int64) for a in self.abs_acc_off], np.int64, pad=0)
        coff, coff_base = _pack_regions(
            [a.astype(np.int64) for a in self.abs_cond_off], np.int64,
            pad=0)
        assert np.array_equal(aoff_base, coff_base)
        self.n_seqs = np.array([c.n_seqs for c in chunks], np.int32)
        self.sa_j = dist.put_replicated(sa, mesh)
        self.start_pos_j = dist.put_replicated(spos, mesh)
        self.seq_len_j = dist.put_replicated(slen, mesh)
        self.abs_acc_off_j = dist.put_replicated(aoff.astype(np.int32), mesh)
        self.abs_cond_off_j = dist.put_replicated(coff.astype(np.int32),
                                                  mesh)
        self.off_base = aoff_base
        # dense position->owning-sequence maps (seq-buffer aligned, same
        # bases as seq_base): replace the per-pair binary search over
        # start_pos (reference src/seed_search.cpp:101-141) with one
        # gather per field. ~16 B/nt of db; pagination bounds the resident
        # size exactly as it bounds the seq buffers themselves.
        pm_sid, pm_start, pm_len, pm_ao, pm_co = [], [], [], [], []
        for ci, c in enumerate(chunks):
            sid = np.searchsorted(c.start_pos, np.arange(len(c.seqs)),
                                  side="right").astype(np.int32) - 1
            sid = np.clip(sid, 0, c.n_seqs - 1)
            pm_sid.append(sid)
            pm_start.append(c.start_pos[sid])
            pm_len.append(c.seq_sizes[sid])
            pm_ao.append(self.abs_acc_off[ci][sid].astype(np.int32))
            pm_co.append(self.abs_cond_off[ci][sid].astype(np.int32))
        self.pos_sid = dist.put_replicated(_pack_regions(pm_sid,
                                                         np.int32)[0], mesh)
        self.pos_start = dist.put_replicated(
            _pack_regions(pm_start, np.int32)[0], mesh)
        self.pos_len = dist.put_replicated(_pack_regions(pm_len,
                                                         np.int32)[0], mesh)
        self.pos_aoff = dist.put_replicated(_pack_regions(pm_ao,
                                                          np.int32)[0], mesh)
        self.pos_coff = dist.put_replicated(_pack_regions(pm_co,
                                                          np.int32)[0], mesh)
        ph, plo = _prefix_hilo(cond)
        self.cond_pref_hi = dist.put_replicated(ph, mesh)
        self.cond_pref_lo = dist.put_replicated(plo, mesh)
        self.cond_pref2 = dist.put_replicated(
            _pair_rows_i32(ph, plo), mesh)
        # packed gather sources (expansion + windowed extension)
        self.seq_nib = dist.put_replicated(_nibble_pack(seq), mesh)
        self.acc4 = dist.put_replicated(_row4_f32(acc), mesh)
        self.cond4 = dist.put_replicated(_row4_f32(cond), mesh)
        self.pos_ls = dist.put_replicated(
            _pack_regions([pm_len[i] + pm_start[i]
                           for i in range(len(chunks))], np.int32)[0], mesh)
        self.pos_ac2 = dist.put_replicated(_pair_rows_i32(
            _pack_regions(pm_ao, np.int32)[0],
            _pack_regions(pm_co, np.int32)[0]), mesh)

    @property
    def bufs(self):
        return (self.seq, self.acc, self.cond)

    @property
    def bufs6(self):
        return (self.seq, self.acc, self.cond,
                self.seq_nib, self.acc4, self.cond4)


@dataclass
class HitStream:
    """Global struct-of-arrays hit stream plus its (query, chunk) grouping.

    groups: list of (qid, cid, lo, hi) half-open slices into the arrays;
    group order is qid-major then cid, matching the reference's output
    order (query loop x page loop, src/rna_interaction_search.cpp:185).
    """

    soa: dict
    groups: list

    def __len__(self) -> int:
        return len(self.soa["q_sp"]) if self.soa else 0


_STREAM_KEYS = ("dbseq_id", "dbseq_start", "q_sp", "db_sp", "q_len",
                "db_len", "acc_e", "hyb_e", "energy")


def _concat_groups(parts, groups_meta):
    """parts: list of SoA dicts; groups_meta: list of (qid, cid)."""
    soa = {}
    groups = []
    lo = 0
    for (qid, cid), part in zip(groups_meta, parts):
        n = len(part["q_sp"])
        groups.append((qid, cid, lo, lo + n))
        lo += n
    for k in _STREAM_KEYS:
        arrs = [np.asarray(part[k]) for part in parts]
        soa[k] = (np.concatenate(arrs) if arrs else
                  np.zeros(0, np.int32))
    return HitStream(soa, groups)


def seed_stage(p, chunks, queries, threads: int = 1) -> HitStream:
    """Stage-1 hits (seed + SA-interval expansion) for every (query, chunk)
    pair. queries: list of (q_enc, q_sa, q_acc, q_cond)."""
    pairs = [(qid, cid) for qid in range(len(queries))
             for cid in range(len(chunks))]

    def one(pair):
        qid, cid = pair
        q_enc, q_sa, q_acc, q_cond = queries[qid]
        return native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[cid],
                                   p, stage=1)

    if threads > 1 and len(pairs) > 1:
        with cf.ThreadPoolExecutor(threads) as ex:
            parts = list(ex.map(one, pairs))
    else:
        parts = [one(pair) for pair in pairs]
    return _concat_groups(parts, pairs)


def _hit_bases(stream: HitStream, qpack: QueryPack, dbpack: DbPack,
               chunks) -> None:
    """Attach per-hit flat-buffer base offsets (qb/qab/dbb/aoff/coff)."""
    n = len(stream)
    soa = stream.soa
    for k in ("qb", "qab", "dbb", "aoff", "coff"):
        soa[k] = np.zeros(n, np.int32)
    for qid, cid, lo, hi in stream.groups:
        soa["qb"][lo:hi] = qpack.enc_base[qid]
        soa["qab"][lo:hi] = qpack.acc_base[qid]
        soa["dbb"][lo:hi] = dbpack.seq_base[cid]
        ids = soa["dbseq_id"][lo:hi]
        soa["aoff"][lo:hi] = dbpack.abs_acc_off[cid][ids]
        soa["coff"][lo:hi] = dbpack.abs_cond_off[cid][ids]


# fixed padded-batch ladders: bound the number of distinct compiled shapes
# (each size is its own XLA program; compiles are cached on disk). Caps are
# DERIVED from the running device's memory limit (utils/devmem), not
# hard-coded for one chip: the gapped kernel's footprint is ~9 value/bit
# planes of [DD~51, lane~50, B] plus the predecessor-link buffer
# (~90 KB/hit at max_ext=32, dropout=16); the ungapped lockstep kernel
# carries only [B]-vectors (~200 B/hit).
from priblast_tpu.utils import devmem

_UNGAPPED_LADDER = (2048, 16384,
                    devmem.ladder_cap(256, 0.05, 65536, 1 << 20))
_GAPPED_LADDER = (2048, devmem.ladder_cap(96 * 1024, 0.25, 4096, 1 << 17))


def _bucket(n: int, ladder) -> int:
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


def ungapped_stage(stream: HitStream, qpack: QueryPack, dbpack: DbPack,
                   p) -> None:
    """Device ungapped extension over the whole stream, in place. Hit
    batches are sharded over the pack's mesh (data parallel over hits)."""
    from priblast_tpu.parallel import dist

    from priblast_tpu.search.ungapped import ungapped_extend_flat

    n = len(stream)
    if n == 0:
        return
    mesh = dbpack.mesh
    soa = stream.soa
    cap = _UNGAPPED_LADDER[-1]
    outs = {k: [] for k in ("q_sp", "db_sp", "q_len", "db_len",
                            "dbseq_start", "acc_e", "hyb_e", "energy")}
    for o in range(0, n, cap):
        ns = min(cap, n - o)
        B = _bucket(ns, _UNGAPPED_LADDER)

        def pad(a, fill=0):
            out = np.full(B, fill, a.dtype)
            out[:ns] = a[o:o + ns]
            return out

        def put(a, fill=0):
            return dist.put_batch(pad(a, fill), mesh)

        res = ungapped_extend_flat(
            put(soa["q_sp"]), put(soa["db_sp"]),
            put(soa["q_len"], 1),
            put(soa["dbseq_start"]),
            put(soa["acc_e"].astype(np.float32)),
            put(soa["hyb_e"].astype(np.float32)),
            put(soa["qb"]), put(soa["qab"]),
            put(soa["dbb"]), put(soa["aoff"]),
            put(soa["coff"]),
            qpack.bufs, dbpack.bufs,
            p.min_accessible_length, p.drop_out_length_wo_gap)
        for k in outs:
            outs[k].append(np.asarray(res[k])[:ns])
    for k in outs:
        soa[k] = np.concatenate(outs[k])


def filter_stream(stream: HitStream, keep: np.ndarray) -> HitStream:
    """Keep a boolean-masked subset, preserving order and regrouping."""
    kept_cum = np.concatenate([[0], np.cumsum(keep)])
    groups = [(qid, cid, int(kept_cum[lo]), int(kept_cum[hi]))
              for qid, cid, lo, hi in stream.groups]
    soa = {k: v[keep] for k, v in stream.soa.items()}
    return HitStream(soa, groups)


def threshold_stage(stream: HitStream, p) -> HitStream:
    """Drop hits above the interaction-energy threshold before the host
    dedup. The reference flags these at the top of its redundancy scan
    (src/rna_interaction_search.cpp:389-391) and flagged hits never affect
    other hits' dedup decisions, so pre-filtering is semantics-preserving —
    and it shrinks the host mid stage's input ~10x."""
    if len(stream) == 0:
        return stream
    return filter_stream(stream,
                         stream.soa["energy"] <= p.interaction_energy_threshold)


def mid_stage(stream: HitStream, queries, chunks, p,
              threads: int = 1):
    """Per-group sort + interaction-threshold dedup + seed base pairs
    (native chain_mid). Returns (new stream, bp arrays dict)."""
    def one(group):
        qid, cid, lo, hi = group
        sub = {k: stream.soa[k][lo:hi] for k in _STREAM_KEYS}
        return native.chain_mid(queries[qid][0], chunks[cid], p, sub)

    if threads > 1 and len(stream.groups) > 1:
        with cf.ThreadPoolExecutor(threads) as ex:
            parts = list(ex.map(one, stream.groups))
    else:
        parts = [one(group) for group in stream.groups]
    meta = [(qid, cid) for qid, cid, _, _ in stream.groups]
    out = _concat_groups(parts, meta)
    bp_off = np.concatenate(
        [np.zeros(1, np.int64)] +
        [np.diff(part["bp_off"]) for part in parts]).cumsum()
    bps = dict(bp_off=bp_off.astype(np.int64),
               bp_q=np.concatenate([part["bp_q"] for part in parts]),
               bp_db=np.concatenate([part["bp_db"] for part in parts]))
    return out, bps


def gapped_stage(stream: HitStream, seed_bps: dict, qpack: QueryPack,
                 dbpack: DbPack, chunks, queries, p, *, max_ext: int = 32,
                 dtype: str = "float32"):
    """Device gapped extension + traceback over the whole stream; assembles
    the final per-hit base-pair arrays (seed + left + right tracebacks, in
    reference push order). Returns bp arrays dict; updates stream in place.

    max_ext=32 is the measured sweet spot (tools/gapped_probe.py): 3.1x
    faster than 64 per block (half the diagonals AND half the lane width),
    with ~3.5% of hits outrunning the cap and falling back to the exact
    host engine — which handles them at ~75k hits/s, so the tail is free.
    """
    from priblast_tpu.search.gapped import gapped_extend_flat_batch

    n = len(stream)
    if n == 0:
        return dict(bp_off=np.zeros(1, np.int64),
                    bp_q=np.zeros(0, np.int32), bp_db=np.zeros(0, np.int32))
    soa = stream.soa
    cap = _GAPPED_LADDER[-1]
    gparts, bparts, oparts = [], [], []
    for o in range(0, n, cap):
        ns = min(cap, n - o)
        sub = {k: soa[k][o:o + ns]
               for k in (*_STREAM_KEYS, "qb", "qab", "dbb", "aoff", "coff")}
        g, b, ov = gapped_extend_flat_batch(
            sub, qpack.bufs, dbpack.bufs,
            d=p.min_accessible_length, dropout=p.drop_out_length_w_gap,
            min_helix=p.min_helix_length, max_ext=max_ext, dtype=dtype,
            pad_to=_bucket(ns, _GAPPED_LADDER), mesh=dbpack.mesh)
        gparts.append(g)
        bparts.append(b)
        oparts.append(ov)
    for k in _STREAM_KEYS:
        soa[k] = np.concatenate([g[k] for g in gparts])
    overflow = np.concatenate(oparts)
    bp = {k: np.concatenate([b[k] for b in bparts])
          for k in ("n0", "q0", "db0", "n1", "q1", "db1")}

    if overflow.any():
        _overflow_fallback(stream, bp, overflow, chunks, queries, p)

    # ---- vectorized assembly: per hit, seed bps then left then right
    n_seed = np.diff(seed_bps["bp_off"]).astype(np.int64)
    total = n_seed + bp["n0"] + bp["n1"]
    bp_off = np.zeros(n + 1, np.int64)
    np.cumsum(total, out=bp_off[1:])
    bp_q = np.empty(bp_off[-1], np.int32)
    bp_db = np.empty(bp_off[-1], np.int32)

    def scatter(counts, start_within, src_q, src_db):
        # destination indices for ragged per-hit segments
        if len(src_q) == 0:
            return
        starts = bp_off[:-1] + start_within
        dst = (np.repeat(starts, counts)
               + _ragged_arange(counts))
        bp_q[dst] = src_q
        bp_db[dst] = src_db

    scatter(n_seed, np.zeros(n, np.int64), seed_bps["bp_q"],
            seed_bps["bp_db"])
    scatter(bp["n0"], n_seed, bp["q0"], bp["db0"])
    scatter(bp["n1"], n_seed + bp["n0"], bp["q1"], bp["db1"])
    return dict(bp_off=bp_off, bp_q=bp_q, bp_db=bp_db)


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for per-segment counts."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - counts, counts)
    return out


def _overflow_fallback(stream: HitStream, bp: dict, overflow: np.ndarray,
                       chunks, queries, p) -> None:
    """Extension outran the device cap (a few % of hits at the default
    max_ext=32) — exact host-engine fallback from the pre-extension state,
    patched into the stream and bp dict. Base-pair segments are rebuilt in
    ONE split/replace/concat pass (not per-hit splicing), so the cost is
    O(total bps), independent of the overflow count."""
    soa = stream.soa
    # gathered replacements: hit index -> (bp_q, bp_db) arrays
    repl: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for qid, cid, lo, hi in stream.groups:
        idx = lo + np.nonzero(overflow[lo:hi])[0]
        if len(idx) == 0:
            continue
        q_enc, _q_sa, q_acc, q_cond = queries[qid]
        sub = {k: soa[f"pre_{k}"][idx] for k in _STREAM_KEYS}
        ref = native.gapped_extend(q_enc, q_acc, q_cond, chunks[cid], p, sub)
        for out_i, src_i in enumerate(idx):
            for k in _STREAM_KEYS:
                soa[k][src_i] = ref[k][out_i]
            blo, bhi = ref["bp_off"][out_i], ref["bp_off"][out_i + 1]
            repl[int(src_i)] = (ref["bp_q"][blo:bhi], ref["bp_db"][blo:bhi])
    if not repl:
        return
    # host fallback emits left+right bps contiguously; the split is
    # irrelevant downstream (only the concatenation order matters), so the
    # replacement lands in the "left" segment and the right one empties
    seg_q = np.split(bp["q0"], np.cumsum(bp["n0"])[:-1])
    seg_db = np.split(bp["db0"], np.cumsum(bp["n0"])[:-1])
    seg_q1 = np.split(bp["q1"], np.cumsum(bp["n1"])[:-1])
    seg_db1 = np.split(bp["db1"], np.cumsum(bp["n1"])[:-1])
    empty = np.zeros(0, np.int32)
    n0 = bp["n0"].copy()
    n1 = bp["n1"].copy()
    for hit, (q, db) in repl.items():
        seg_q[hit], seg_db[hit] = q, db
        seg_q1[hit], seg_db1[hit] = empty, empty
        n0[hit] = len(q)
        n1[hit] = 0
    bp["n0"], bp["n1"] = n0, n1
    bp["q0"] = np.concatenate(seg_q) if seg_q else bp["q0"]
    bp["db0"] = np.concatenate(seg_db) if seg_db else bp["db0"]
    bp["q1"] = np.concatenate(seg_q1) if seg_q1 else bp["q1"]
    bp["db1"] = np.concatenate(seg_db1) if seg_db1 else bp["db1"]


def finish_stage(stream: HitStream, bps: dict, queries, chunks, p,
                 threads: int = 1):
    """Per-group finish (dangles, bp sort, final sort + dedup). Returns a
    list of per-group SoA result dicts aligned with stream.groups."""
    def one(group):
        qid, cid, lo, hi = group
        sub = {k: stream.soa[k][lo:hi] for k in _STREAM_KEYS}
        blo = bps["bp_off"][lo]
        bhi = bps["bp_off"][hi]
        off = bps["bp_off"][lo:hi + 1] - blo
        return native.chain_finish(queries[qid][0], chunks[cid], p, sub,
                                   off, bps["bp_q"][blo:bhi],
                                   bps["bp_db"][blo:bhi])

    if threads > 1 and len(stream.groups) > 1:
        with cf.ThreadPoolExecutor(threads) as ex:
            return list(ex.map(one, stream.groups))
    return [one(group) for group in stream.groups]


def search_all(p, chunks, queries, qpack: QueryPack, dbpack: DbPack, *,
               threads: int = 1, max_ext: int = 32, dtype: str = "float32",
               cands=None):
    """Full staged pipeline. Returns (stream, results) where results is the
    per-group finished SoA list aligned with stream.groups. `cands`: host
    seed-DFS candidates, if the caller already ran them (auto path picker)."""
    from priblast_tpu.utils import profiling as prof

    with prof.stage("ris.seed"):
        if qpack.sa is not None:
            # host DFS -> fused device expansion + ungapped + threshold
            # (search/fused.py: one device pass per pair block, compacted
            # readback — the transfer-frugal production path)
            from priblast_tpu.search import fused, seed

            if cands is None:
                cands = seed.seed_candidates(p, chunks, queries, threads)
            stream = fused.fused_stage(p, cands, qpack, dbpack, dtype=dtype)
        else:
            # staged fallback: per-(query, chunk) native stage-1 hits,
            # device ungapped over the full stream, host threshold
            stream = seed_stage(p, chunks, queries, threads)
            _hit_bases(stream, qpack, dbpack, chunks)
            with prof.stage("ris.ungapped"):
                ungapped_stage(stream, qpack, dbpack, p)
            stream = threshold_stage(stream, p)
    with prof.stage("ris.mid"):
        stream, seed_bps = mid_stage(stream, queries, chunks, p, threads)
        _hit_bases(stream, qpack, dbpack, chunks)
        # keep pre-extension state for the overflow fallback
        for k in _STREAM_KEYS:
            stream.soa[f"pre_{k}"] = stream.soa[k].copy()
    with prof.stage("ris.gapped"):
        bps = gapped_stage(stream, seed_bps, qpack, dbpack, chunks, queries,
                           p, max_ext=max_ext, dtype=dtype)
    with prof.stage("ris.finish"):
        results = finish_stage(stream, bps, queries, chunks, p, threads)
    return stream, results
