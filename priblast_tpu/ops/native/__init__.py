"""Native (C++) exact engine: build-on-first-use + ctypes bindings.

The shared library is compiled from the .cc sources in this directory with
g++ on first import and cached next to them (keyed on a source hash).
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SOURCES = ["exact_engine.cc", "suffix_array.cc", "sa_is.cc", "search.cc"]
_HEADERS = ["fastmath.hpp"]


_FLAGS_TAG = b"O3-native-nocontract"  # bump when the build flags change


def _host_arch_tag() -> bytes:
    """Host CPU identifier folded into the .so cache key: with
    -march=native a cached build from one machine can SIGILL on an older
    CPU when the checkout is shared or copied."""
    import platform

    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    tag += "|" + line.split(":", 1)[1].strip()
                    break
                if line.startswith("flags"):
                    tag += "|" + hashlib.sha256(
                        line.encode()).hexdigest()[:8]
                    break
    except OSError:
        pass
    return tag.encode()


def _source_hash() -> str:
    h = hashlib.sha256(_FLAGS_TAG + _host_arch_tag())
    for name in _SOURCES + _HEADERS:
        p = _DIR / name
        if p.exists():
            h.update(p.read_bytes())
    return h.hexdigest()[:16]


def _build() -> Path:
    tag = _source_hash()
    out = _DIR / f"_exact_{tag}.so"
    if out.exists():
        return out
    srcs = [str(_DIR / s) for s in _SOURCES if (_DIR / s).exists()]
    with tempfile.TemporaryDirectory() as td:
        tmp_out = Path(td) / out.name
        # -march=native vectorizes the DP loops; -ffp-contract=off keeps
        # the float arithmetic exactly IEEE (no FMA contraction), which
        # byte parity with the reference's SSE2 fmath paths depends on
        cmd = [
            "g++", "-std=c++17", "-O3", "-march=native",
            "-ffp-contract=off", "-fPIC", "-shared", "-fopenmp",
            "-o", str(tmp_out), *srcs,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp_out, out)
    # clean stale builds
    for old in _DIR.glob("_exact_*.so"):
        if old.name != out.name:
            try:
                old.unlink()
            except OSError:
                pass
    return out


def _np(arr, dtype):
    a = np.ascontiguousarray(arr, dtype=dtype)
    return a, a.ctypes.data_as(ctypes.c_void_p)


@functools.lru_cache(maxsize=1)
def lib() -> ctypes.CDLL:
    so = ctypes.CDLL(str(_build()))
    so.rp_raccess.restype = ctypes.c_int
    so.rp_search_chunk.restype = ctypes.c_void_p
    so.rp_search_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,                                  # query
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, # db seq + sa
        ctypes.c_void_p, ctypes.c_void_p,                 # hash
        ctypes.c_void_p, ctypes.c_void_p,                 # acc/cond
        ctypes.c_void_p, ctypes.c_void_p,                 # offsets
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,   # seq_len/start_pos/n
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    so.rp_chain_from_hits.restype = ctypes.c_void_p
    so.rp_chain_from_hits.argtypes = (
        [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
         ctypes.c_void_p, ctypes.c_int64] + [ctypes.c_void_p] * 6 +
        [ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
         ctypes.c_int, ctypes.c_int, ctypes.c_int64] + [ctypes.c_void_p] * 9)
    so.rp_chain_mid.restype = ctypes.c_void_p
    so.rp_chain_mid.argtypes = (
        [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
         ctypes.c_double, ctypes.c_int64] + [ctypes.c_void_p] * 9)
    so.rp_gapped_extend.restype = ctypes.c_void_p
    so.rp_gapped_extend.argtypes = (
        [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
         ctypes.c_void_p, ctypes.c_int64] + [ctypes.c_void_p] * 6 +
        [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
         ctypes.c_int64] + [ctypes.c_void_p] * 9)
    so.rp_chain_finish.restype = ctypes.c_void_p
    so.rp_chain_finish.argtypes = (
        [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
         ctypes.c_double, ctypes.c_int64] + [ctypes.c_void_p] * 12)
    so.rp_result_sizes.argtypes = [ctypes.c_void_p] * 3
    so.rp_result_copy.argtypes = [ctypes.c_void_p] * 13
    so.rp_result_free.argtypes = [ctypes.c_void_p]
    _init_params(so)
    return so


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return a.ctypes.data_as(ctypes.c_void_p)


def sa_build(seq: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8-encoded string (SA-IS, linear time)."""
    so = lib()
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    sa = np.empty(len(seq), dtype=np.int32)
    so.rp_sais(_ptr(seq), ctypes.c_int64(len(seq)), _ptr(sa))
    return sa


def sa_build_doubling(seq: np.ndarray) -> np.ndarray:
    """Prefix-doubling builder (kept for cross-validation)."""
    so = lib()
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    sa = np.empty(len(seq), dtype=np.int32)
    so.rp_sa_build(_ptr(seq), ctypes.c_int64(len(seq)), _ptr(sa))
    return sa


def kmer_hash(seq: np.ndarray, sa: np.ndarray, hash_size: int):
    """SA intervals for every k-mer, k=1..hash_size, flattened level-major."""
    so = lib()
    slots = (4 ** (hash_size + 1) - 4) // 3
    hstart = np.empty(slots, dtype=np.int32)
    hend = np.empty(slots, dtype=np.int32)
    so.rp_kmer_hash(_ptr(seq), ctypes.c_int64(len(seq)), _ptr(sa),
                    ctypes.c_int(hash_size), _ptr(hstart), _ptr(hend))
    return hstart, hend


def argsort_desc(lengths) -> np.ndarray:
    """Descending argsort with libstdc++ std::sort tie permutation."""
    so = lib()
    ln = np.ascontiguousarray(lengths, dtype=np.int64)
    order = np.empty(len(ln), dtype=np.int32)
    so.rp_argsort_desc(_ptr(ln), ctypes.c_int64(len(ln)), _ptr(order))
    return order


def search_chunk(q_seq, q_sa, q_acc, q_cond, chunk, p, stage: int = 0):
    """Run the per-query-per-chunk search chain on the exact engine.

    `chunk` is a priblast_tpu.utils.store.DbChunk; `p` a RisParams.
    stage: 0 = full chain, 1 = stop after seed expansion, 2 = stop after
    ungapped extension (used to validate the device kernels).
    Returns a dict of struct-of-arrays hit fields + base pairs.
    """
    so = lib()
    handle = so.rp_search_chunk(
        _ptr(q_seq), ctypes.c_int(len(q_seq)), _ptr(q_sa), _ptr(q_acc),
        _ptr(q_cond),
        _ptr(chunk.seqs), ctypes.c_int64(len(chunk.seqs)),
        _ptr(chunk.suffix_array), _ptr(chunk.hash_start), _ptr(chunk.hash_end),
        _ptr(chunk.acc), _ptr(chunk.cond), _ptr(chunk.acc_off),
        _ptr(chunk.cond_off), _ptr(chunk.seq_sizes), _ptr(chunk.start_pos),
        ctypes.c_int(chunk.n_seqs),
        ctypes.c_int(p.hash_size), ctypes.c_int(p.max_seed_length),
        ctypes.c_int(p.min_accessible_length),
        ctypes.c_double(p.hybrid_energy_threshold),
        ctypes.c_double(p.interaction_energy_threshold),
        ctypes.c_double(p.final_threshold),
        ctypes.c_int(p.drop_out_length_wo_gap),
        ctypes.c_int(p.drop_out_length_w_gap),
        ctypes.c_int(p.min_helix_length), ctypes.c_int(stage),
    )
    if not handle:
        raise RuntimeError("rp_search_chunk failed (params not set?)")
    try:
        n_hits = ctypes.c_int64()
        n_bps = ctypes.c_int64()
        so.rp_result_sizes(handle, ctypes.byref(n_hits), ctypes.byref(n_bps))
        n, b = n_hits.value, n_bps.value
        out = {
            "dbseq_id": np.empty(n, np.int32),
            "dbseq_start": np.empty(n, np.int32),
            "q_sp": np.empty(n, np.int32),
            "db_sp": np.empty(n, np.int32),
            "q_len": np.empty(n, np.int32),
            "db_len": np.empty(n, np.int32),
            "acc_e": np.empty(n, np.float64),
            "hyb_e": np.empty(n, np.float64),
            "energy": np.empty(n, np.float64),
            "bp_off": np.empty(n + 1, np.int64),
            "bp_q": np.empty(b, np.int32),
            "bp_db": np.empty(b, np.int32),
        }
        so.rp_result_copy(handle, *[_ptr(out[k]) for k in (
            "dbseq_id", "dbseq_start", "q_sp", "db_sp", "q_len", "db_len",
            "acc_e", "hyb_e", "energy", "bp_off", "bp_q", "bp_db")])
        if n == 0:
            out["bp_off"][0] = 0
        return out
    finally:
        so.rp_result_free(handle)


def chain_from_hits(q_enc, q_acc, q_cond, chunk, p, hits):
    """Resume the exact chain after device ungapped extension. `hits` is a
    dict of SoA arrays (int32/float64)."""
    so = lib()
    n = len(hits["q_sp"])
    arrs = {k: np.ascontiguousarray(hits[k], dtype=np.int32)
            for k in ("dbseq_id", "dbseq_start", "q_sp", "db_sp", "q_len",
                      "db_len")}
    for k in ("acc_e", "hyb_e", "energy"):
        arrs[k] = np.ascontiguousarray(hits[k], dtype=np.float64)
    handle = so.rp_chain_from_hits(
        _ptr(q_enc), ctypes.c_int(len(q_enc)), _ptr(q_acc), _ptr(q_cond),
        _ptr(chunk.seqs), ctypes.c_int64(len(chunk.seqs)),
        _ptr(chunk.acc), _ptr(chunk.cond), _ptr(chunk.acc_off),
        _ptr(chunk.cond_off), _ptr(chunk.seq_sizes), _ptr(chunk.start_pos),
        ctypes.c_int(chunk.n_seqs),
        ctypes.c_int(p.min_accessible_length),
        ctypes.c_double(p.interaction_energy_threshold),
        ctypes.c_double(p.final_threshold),
        ctypes.c_int(p.drop_out_length_w_gap),
        ctypes.c_int(p.min_helix_length),
        ctypes.c_int64(n),
        *[_ptr(arrs[k]) for k in ("dbseq_id", "dbseq_start", "q_sp", "db_sp",
                                  "q_len", "db_len", "acc_e", "hyb_e",
                                  "energy")])
    if not handle:
        raise RuntimeError("rp_chain_from_hits failed")
    return _copy_result(so, handle)


_HIT_KEYS = ("dbseq_id", "dbseq_start", "q_sp", "db_sp", "q_len", "db_len",
             "acc_e", "hyb_e", "energy")


def _hit_arrays(hits):
    out = {k: np.ascontiguousarray(hits[k], dtype=np.int32)
           for k in _HIT_KEYS[:6]}
    for k in _HIT_KEYS[6:]:
        out[k] = np.ascontiguousarray(hits[k], dtype=np.float64)
    return out


def chain_mid(q_enc, chunk, p, hits):
    """Sort + interaction-threshold dedup + seed base pairs (the chain
    between the ungapped and gapped extensions)."""
    so = lib()
    arrs = _hit_arrays(hits)
    handle = so.rp_chain_mid(
        _ptr(q_enc), ctypes.c_int(len(q_enc)),
        _ptr(chunk.seqs), ctypes.c_int64(len(chunk.seqs)),
        ctypes.c_double(p.interaction_energy_threshold),
        ctypes.c_int64(len(arrs["q_sp"])),
        *[_ptr(arrs[k]) for k in _HIT_KEYS])
    if not handle:
        raise RuntimeError("rp_chain_mid failed")
    return _copy_result(so, handle)


def gapped_extend(q_enc, q_acc, q_cond, chunk, p, hits):
    """Host gapped extension (both flags, no dangles) for a hit subset —
    the device kernel's oracle and its max_ext-overflow fallback."""
    so = lib()
    arrs = _hit_arrays(hits)
    handle = so.rp_gapped_extend(
        _ptr(q_enc), ctypes.c_int(len(q_enc)), _ptr(q_acc), _ptr(q_cond),
        _ptr(chunk.seqs), ctypes.c_int64(len(chunk.seqs)),
        _ptr(chunk.acc), _ptr(chunk.cond), _ptr(chunk.acc_off),
        _ptr(chunk.cond_off), _ptr(chunk.seq_sizes), _ptr(chunk.start_pos),
        ctypes.c_int(chunk.n_seqs),
        ctypes.c_int(p.min_accessible_length),
        ctypes.c_int(p.drop_out_length_w_gap),
        ctypes.c_int(p.min_helix_length),
        ctypes.c_int64(len(arrs["q_sp"])),
        *[_ptr(arrs[k]) for k in _HIT_KEYS])
    if not handle:
        raise RuntimeError("rp_gapped_extend failed")
    return _copy_result(so, handle)


def chain_finish(q_enc, chunk, p, hits, bp_off, bp_q, bp_db):
    """Dangles + per-hit bp sort + final sort + final-threshold dedup."""
    so = lib()
    arrs = _hit_arrays(hits)
    bp_off = np.ascontiguousarray(bp_off, dtype=np.int64)
    bp_q = np.ascontiguousarray(bp_q, dtype=np.int32)
    bp_db = np.ascontiguousarray(bp_db, dtype=np.int32)
    handle = so.rp_chain_finish(
        _ptr(q_enc), ctypes.c_int(len(q_enc)),
        _ptr(chunk.seqs), ctypes.c_int64(len(chunk.seqs)),
        ctypes.c_double(p.final_threshold),
        ctypes.c_int64(len(arrs["q_sp"])),
        *[_ptr(arrs[k]) for k in _HIT_KEYS],
        _ptr(bp_off), _ptr(bp_q), _ptr(bp_db))
    if not handle:
        raise RuntimeError("rp_chain_finish failed")
    return _copy_result(so, handle)


def _copy_result(so, handle):
    try:
        n_hits = ctypes.c_int64()
        n_bps = ctypes.c_int64()
        so.rp_result_sizes(handle, ctypes.byref(n_hits), ctypes.byref(n_bps))
        n, b = n_hits.value, n_bps.value
        out = {
            "dbseq_id": np.empty(n, np.int32),
            "dbseq_start": np.empty(n, np.int32),
            "q_sp": np.empty(n, np.int32),
            "db_sp": np.empty(n, np.int32),
            "q_len": np.empty(n, np.int32),
            "db_len": np.empty(n, np.int32),
            "acc_e": np.empty(n, np.float64),
            "hyb_e": np.empty(n, np.float64),
            "energy": np.empty(n, np.float64),
            "bp_off": np.empty(n + 1, np.int64),
            "bp_q": np.empty(b, np.int32),
            "bp_db": np.empty(b, np.int32),
        }
        so.rp_result_copy(handle, *[_ptr(out[k]) for k in (
            "dbseq_id", "dbseq_start", "q_sp", "db_sp", "q_len", "db_len",
            "acc_e", "hyb_e", "energy", "bp_off", "bp_q", "bp_db")])
        if n == 0:
            out["bp_off"][0] = 0
        return out
    finally:
        so.rp_result_free(handle)


def _init_params(so: ctypes.CDLL) -> None:
    from priblast_tpu.utils import thermo

    sp = thermo.scaled()
    r = thermo.RAW
    keep = []  # keep arrays alive for the duration of the call

    def ip(x):
        a, p = _np(x, np.int32)
        keep.append(a)
        return p

    def dp(x):
        a, p = _np(x, np.float64)
        keep.append(a)
        return p

    so.rp_set_params(
        ip(r.BP_pair), ip(r.rtype),
        dp(sp.hairpin), dp(sp.mismatch_h), dp(sp.mismatch_i), dp(sp.stack),
        dp(sp.bulge), dp(sp.internal), dp(sp.int11), dp(sp.int21),
        dp(sp.int22), dp(sp.dangle5), dp(sp.dangle3), dp(sp.ninio),
        ctypes.c_double(sp.ml_closing), ctypes.c_double(sp.ml_intern),
        ctypes.c_double(sp.ml_base), ctypes.c_double(sp.term_au),
        ctypes.c_double(sp.kT), ctypes.c_double(sp.lxc),
        ip(r.stack37), ip(r.mismatchI37), ip(r.int11_37), ip(r.int21_37),
        ip(r.int22_37), ip(r.internal_loop37), ip(r.bulge37),
        ip(r.dangle5_37), ip(r.dangle3_37),
        ctypes.c_int(int(r.TerminalAU)),
    )


def raccess(codes: np.ndarray, w: int, d: int):
    """Exact accessibility for one sequence.

    codes: uint8 array of 0..4 (0 unknown, 1..4 = ACGU), length n.
    Returns (acc, cond) float32 arrays of length n (acc valid in [0, n-d],
    cond valid in [d, n-1]); see reference src/raccess.cpp:484-528.
    """
    so = lib()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = len(codes)
    acc = np.zeros(n, dtype=np.float32)
    cond = np.zeros(n, dtype=np.float32)
    rc = so.rp_raccess(
        codes.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(n),
        ctypes.c_int(w), ctypes.c_int(d),
        acc.ctypes.data_as(ctypes.c_void_p),
        cond.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise RuntimeError(f"rp_raccess failed with {rc}")
    return acc, cond
