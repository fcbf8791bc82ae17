"""TPU path of the ris step.

Per wave of queries: accessibility runs on-device in length-bucketed
batches (the per-query hot DP, reference: src/rna_interaction_search.cpp:175),
then the staged cross-query search pipeline (search/pipeline.py) extends
every (query, chunk) hit stream with the device ungapped + gapped kernels —
host threads only run the cheap seed/dedup/finish stages. Hit semantics are
identical to the exact engine; only the energies carry the f32 engine's
~1e-4 kcal/mol deviation (use --engine exact for byte parity).

Set PRIBLAST_DEVICE_EXTEND=0 to fall back to the host extension chain
(device accessibility + native C++ seed-and-extend per query)."""

from __future__ import annotations

import concurrent.futures as cf
import os

import numpy as np

from priblast_tpu.models import db_tpu
from priblast_tpu.ops import native
from priblast_tpu.utils import alphabet
from priblast_tpu.utils import profiling as prof
from priblast_tpu.utils.params import RisParams


def device_extend_mode() -> str:
    """Device extension chain (seed hits extended on-device via the fused
    expansion/ungapped + gapped kernels instead of the host engine threads).

    PRIBLAST_DEVICE_EXTEND: 1 always, 0 never, auto (default) decide per
    wave by comparing the measured host-chain and device-chain rates on the
    wave's candidate-pair count (device_extend_wins) — on a single tunneled
    chip the native host chain wins at any size; a large device mesh tips
    the estimate the other way (measured: tools/gapped_probe.py +
    tools/stage_probe.py, NOTES.md round-3 table)."""
    v = os.environ.get("PRIBLAST_DEVICE_EXTEND", "auto").lower()
    if v in ("0", "false", "never"):
        return "never"
    if v in ("1", "true", "always"):
        return "always"
    return "auto"


# Measured on the round-4 bench host (one tunneled v5e chip, 2 CPU cores;
# tools/fused_split + gapped_probe, NOTES.md round-4 table):
#   host full chain (seed DFS + SA expand + ungapped + gapped, native C++):
#     ~500k candidate pairs/s/core
#   device fused expand+window-ungapped (v2, warm): ~300k pairs/s/chip
#   device gapped DP (plane scan, warm):            ~21k post-mid hits/s
#   post-mid hit density:                           ~10% of candidate pairs
# On this 2-core host the native chain still wins ~3x at any wave size;
# the device chain pays off once the mesh is a few chips per host core
# pair. Auto mode compares the two estimates (including a fixed per-wave
# device dispatch cost — on a tunneled chip each kernel round trip is
# 10-30 ms, so tiny waves must never route to the device); rates are
# env-overridable for other platforms.
HOST_PAIR_RATE = float(os.environ.get("PRIBLAST_HOST_PAIR_RATE", 500e3))
DEV_PAIR_RATE = float(os.environ.get("PRIBLAST_DEV_PAIR_RATE", 300e3))
DEV_HIT_RATE = float(os.environ.get("PRIBLAST_DEV_HIT_RATE", 21e3))
HIT_DENSITY = float(os.environ.get("PRIBLAST_HIT_DENSITY", 0.10))
DEV_DISPATCH_S = float(os.environ.get("PRIBLAST_DEV_DISPATCH_S", 0.15))


def device_extend_wins(n_pairs: int, threads: int, n_dev: int) -> bool:
    """Auto-mode estimate: device extension chain vs host chain for a wave
    of `n_pairs` candidate pairs. dev_t carries the fixed per-wave
    dispatch/sync cost so tiny waves on large meshes stay on the host."""
    host_t = n_pairs / (HOST_PAIR_RATE * max(threads, 1))
    dev_t = (DEV_DISPATCH_S
             + n_pairs / (DEV_PAIR_RATE * n_dev)
             + n_pairs * HIT_DENSITY / (DEV_HIT_RATE * n_dev))
    return dev_t < host_t


def _wave_plan(order, lengths, max_nt: int = 4 << 20, max_q: int = 1024):
    """Split queries (descending-length order) into waves bounded by total
    nucleotides and count, so flat device buffers stay bounded and early
    waves start while later ones wait."""
    wave: list[int] = []
    nt = 0
    for idx in order:
        if wave and (nt + lengths[idx] > max_nt or len(wave) >= max_q):
            yield wave
            wave, nt = [], 0
        wave.append(idx)
        nt += lengths[idx]
    if wave:
        yield wave


def _accessibility_batched(engine, seqs, lengths, idxs):
    """Device accessibility for the given query indices; returns
    {idx: (acc, cond)} float32 arrays of per-sequence length."""
    out = {}
    for group, bsz, padded in db_tpu.plan_batches(
            [lengths[i] for i in idxs]):
        codes = np.zeros((bsz, padded), np.uint8)
        lens = np.zeros(bsz, np.int32)
        sel = [idxs[g] for g in group]
        for bi, idx in enumerate(sel):
            codes[bi, : lengths[idx]] = alphabet.access_codes(seqs[idx])
            lens[bi] = lengths[idx]
        acc, cond = engine.run(codes, lens)
        for bi, idx in enumerate(sel):
            ln = lengths[idx]
            out[idx] = (np.ascontiguousarray(acc[bi, :ln]),
                        np.ascontiguousarray(cond[bi, :ln]))
    return out


def run_queries(p: RisParams, chunks, names, seqs, order, results,
                threads: int | None = None) -> None:
    from priblast_tpu.accessibility.batched import BatchedRaccess
    from priblast_tpu.parallel import dist

    mesh = dist.maybe_mesh()
    dtype = getattr(p, "dtype", "float32") or "float32"
    engine = BatchedRaccess(p.maximal_span, p.min_accessible_length,
                            dtype=dtype, mesh=mesh)
    native.lib()
    threads = threads or min(32, os.cpu_count() or 1)
    lengths = [len(s) for s in seqs]
    mode = device_extend_mode()

    dbpack = None
    if mode != "never":
        from priblast_tpu.search import pipeline as pl

    from priblast_tpu.models.ris import format_hits

    def host_search(idx, q_enc, q_sa, q_acc, q_cond):
        lines: list[str] = []
        q_length = int(np.count_nonzero((q_enc >= 2) & (q_enc <= 5)))
        for chunk in chunks:
            res = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunk, p)
            lines.extend(format_hits(p, res, chunk, names[idx], q_length))
        return lines

    import sys
    import time as _time

    def _progress(done_q: int, t_start: float) -> None:
        # per-wave progress on BOTH extension paths (host and device)
        if os.environ.get("PRIBLAST_PROGRESS"):
            el = max(_time.time() - t_start, 1e-9)
            print(f"[ris] {done_q} queries, {el:.0f}s "
                  f"({done_q / el:.3f} q/s)", file=sys.stderr, flush=True)

    done_q = 0
    t_start = _time.time()
    for wave in _wave_plan(order, lengths):
        with prof.stage("ris.accessibility"):
            accs = _accessibility_batched(engine, seqs, lengths, wave)
        queries = []
        for idx in wave:
            q_enc = alphabet.encode_query(seqs[idx], p.repeat_flag)
            q_sa = native.sa_build(q_enc)
            q_acc, q_cond = accs[idx]
            queries.append((q_enc, q_sa, q_acc, q_cond))

        cands = None
        use_device = mode == "always"
        if mode == "auto":
            # host seed DFS is cheap; its candidate pair count is the size
            # signal for host-vs-device extension (reused by the device path)
            from priblast_tpu.search import seed as seed_mod

            cands = seed_mod.seed_candidates(p, chunks, queries, threads)
            n_pairs = sum(
                int(((c["db_sp"] - c["q_sp"] + 1).astype(np.int64)
                     * (c["db_len"] - c["q_len"] + 1)).sum())
                for _, c in cands)
            n_dev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
            use_device = device_extend_wins(n_pairs, threads, n_dev)

        if not use_device:
            with cf.ThreadPoolExecutor(threads) as ex:
                futs = {ex.submit(host_search, idx, *queries[k]): idx
                        for k, idx in enumerate(wave)}
                for f in cf.as_completed(futs):
                    results[futs[f]] = f.result()
            done_q += len(wave)
            _progress(done_q, t_start)
            continue

        if dbpack is None:
            dbpack = pl.DbPack(chunks, mesh=mesh)
        qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                             [q[2] for q in queries],
                             [q[3] for q in queries],
                             [q[1] for q in queries], mesh=mesh)
        stream, finished = pl.search_all(p, chunks, queries, qpack, dbpack,
                                         threads=threads, dtype=dtype,
                                         cands=cands)
        with prof.stage("ris.format"):
            per_query: dict[int, list[str]] = {idx: [] for idx in wave}
            for (qid, cid, _lo, _hi), res in zip(stream.groups, finished):
                idx = wave[qid]
                q_length = int(np.count_nonzero(
                    (queries[qid][0] >= 2) & (queries[qid][0] <= 5)))
                per_query[idx].extend(
                    format_hits(p, res, chunks[cid], names[idx], q_length))
            for idx in wave:
                results[idx] = per_query[idx]
        done_q += len(wave)
        _progress(done_q, t_start)
