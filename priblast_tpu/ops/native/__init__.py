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
_SOURCES = ["exact_engine.cc", "suffix_array.cc", "search.cc"]
_HEADERS = ["fastmath.hpp"]


def _source_hash() -> str:
    h = hashlib.sha256()
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
        cmd = [
            "g++", "-std=c++17", "-O3", "-fPIC", "-shared", "-fopenmp",
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
    _init_params(so)
    return so


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
