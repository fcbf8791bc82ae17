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


# Measured on the round-5 bench host (one tunneled v5e chip, 2 CPU cores;
# tools/fused_micro + gapped_probe):
#   host full chain (seed DFS + SA expand + ungapped + gapped, native C++):
#     ~500k candidate pairs/s/core
#   device fused expand+window-ungapped (v2 + row-packed gathers, warm):
#     ~550k pairs/s/chip
#   device gapped DP (Pallas per-diagonal sweep, warm): ~39k hits/s
#   post-mid hit density:                               ~10% of pairs
# Auto mode runs BOTH chains concurrently (hybrid): queries are LPT-
# assigned to the host engine and the device engine by these rates, so a
# chip adds throughput on top of the host cores instead of replacing
# them (the TPU-native analog of the reference's dynamic RMA stealing
# between heterogeneous ranks, src/rna_interaction_search.cpp:94-152).
# Rates are env-overridable and self-calibrate across waves from the
# measured per-side wall times.
HOST_PAIR_RATE = float(os.environ.get("PRIBLAST_HOST_PAIR_RATE", 500e3))
DEV_PAIR_RATE = float(os.environ.get("PRIBLAST_DEV_PAIR_RATE", 550e3))
DEV_HIT_RATE = float(os.environ.get("PRIBLAST_DEV_HIT_RATE", 39e3))
HIT_DENSITY = float(os.environ.get("PRIBLAST_HIT_DENSITY", 0.10))
DEV_DISPATCH_S = float(os.environ.get("PRIBLAST_DEV_DISPATCH_S", 0.15))

# measured-rate state (pairs/s), updated per wave by the hybrid splitter
_CAL = {"host": None, "dev": None}


def _host_rate(threads: int) -> float:
    return _CAL["host"] or (HOST_PAIR_RATE * max(threads, 1))


def _dev_rate(n_dev: int) -> float:
    if _CAL["dev"]:
        return _CAL["dev"]
    per_pair = 1.0 / DEV_PAIR_RATE + HIT_DENSITY / DEV_HIT_RATE
    return n_dev / per_pair


def device_extend_wins(n_pairs: int, threads: int, n_dev: int) -> bool:
    """Winner-take-all estimate (kept for tests and PRIBLAST_HYBRID=0):
    device extension chain vs host chain for a wave of `n_pairs` candidate
    pairs. dev_t carries the fixed per-wave dispatch/sync cost so tiny
    waves on large meshes stay on the host."""
    host_t = n_pairs / (HOST_PAIR_RATE * max(threads, 1))
    dev_t = (DEV_DISPATCH_S
             + n_pairs / (DEV_PAIR_RATE * n_dev)
             + n_pairs * HIT_DENSITY / (DEV_HIT_RATE * n_dev))
    return dev_t < host_t


def split_wave(pairs_by_q: dict, threads: int, n_dev: int):
    """LPT assignment of a wave's queries over the two engines: each query
    (descending pair count) goes to the side whose projected finish time
    stays lower. Returns (host_qids, dev_qids). The device side carries
    its fixed dispatch cost, so small waves naturally stay host-only."""
    hr = _host_rate(threads)
    dr = _dev_rate(n_dev)
    t_h, t_d = 0.0, DEV_DISPATCH_S
    host_ids, dev_ids = [], []
    for qid in sorted(pairs_by_q, key=lambda q: (-pairs_by_q[q], q)):
        np_q = pairs_by_q[qid]
        if np_q <= 0:
            host_ids.append(qid)
            continue
        if t_h + np_q / hr <= t_d + np_q / dr:
            host_ids.append(qid)
            t_h += np_q / hr
        else:
            dev_ids.append(qid)
            t_d += np_q / dr
    return host_ids, dev_ids


def _calibrate(side: str, n_pairs: int, wall_s: float) -> None:
    """Update the measured per-side rate (EMA) after a wave."""
    if n_pairs <= 0 or wall_s <= 1e-3:
        return
    rate = n_pairs / wall_s
    _CAL[side] = rate if _CAL[side] is None else \
        0.5 * _CAL[side] + 0.5 * rate


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
        host_qids = list(range(len(wave)))
        dev_qids: list[int] = []
        pairs_by_q: dict[int, int] = {}
        n_dev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
        if mode == "always":
            host_qids, dev_qids = [], list(range(len(wave)))
        elif mode == "auto":
            # host seed DFS is cheap; its per-query candidate pair counts
            # drive the hybrid host/device split (reused by both paths)
            from priblast_tpu.search import seed as seed_mod

            cands = seed_mod.seed_candidates(p, chunks, queries, threads)
            pairs_by_q = {qid: 0 for qid in range(len(wave))}
            for (qid, _cid), c in cands:
                pairs_by_q[qid] += int(
                    ((c["db_sp"] - c["q_sp"] + 1).astype(np.int64)
                     * (c["db_len"] - c["q_len"] + 1)).sum())
            hyb = os.environ.get("PRIBLAST_HYBRID", "auto").lower()
            if hyb == "auto":
                # hybrid by default on real chips with spare cores. The
                # CPU backend's "device" chain is XLA-on-CPU (never worth
                # splitting to), and on a <=3-core host the host chain
                # starves the device driver's own host/transfer work
                # (measured: device D2H collapses ~100x under a saturated
                # 2-core host), so few-core hosts stay winner-take-all.
                import jax as _jax

                hyb = ("1" if _jax.default_backend() == "tpu"
                       and threads >= 4 else "0")
            if hyb in ("0", "false"):
                n_pairs = sum(pairs_by_q.values())
                if device_extend_wins(n_pairs, threads, n_dev):
                    host_qids, dev_qids = [], list(range(len(wave)))
            else:
                host_qids, dev_qids = split_wave(pairs_by_q, threads,
                                                 n_dev)

        dev_exc: list = []
        dev_thread = None
        if dev_qids:
            if dbpack is None:
                dbpack = pl.DbPack(chunks, mesh=mesh)
            qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                                 [q[2] for q in queries],
                                 [q[3] for q in queries],
                                 [q[1] for q in queries], mesh=mesh)
            dev_set = set(dev_qids)
            # the device side works off the already-seeded candidate subset
            # (in "always" mode cands is None and search_all seeds itself)
            cands_dev = (None if cands is None else
                         [g for g in cands if g[0][0] in dev_set])

            def run_device():
                t0 = _time.time()
                try:
                    stream, finished = pl.search_all(
                        p, chunks, queries, qpack, dbpack,
                        threads=max(1, threads // 2), dtype=dtype,
                        cands=cands_dev)
                    with prof.stage("ris.format"):
                        per_query: dict[int, list[str]] = {
                            wave[qid]: [] for qid in dev_qids}
                        for (qid, cid, _lo, _hi), res in zip(
                                stream.groups, finished):
                            idx = wave[qid]
                            q_length = int(np.count_nonzero(
                                (queries[qid][0] >= 2)
                                & (queries[qid][0] <= 5)))
                            per_query[idx].extend(format_hits(
                                p, res, chunks[cid], names[idx], q_length))
                        for qid in dev_qids:
                            results[wave[qid]] = per_query[wave[qid]]
                except Exception as e:  # degrade to host for this subset
                    dev_exc.append(e)
                else:
                    _calibrate("dev", sum(pairs_by_q.get(q, 0)
                                          for q in dev_qids),
                               _time.time() - t0)

            import threading

            dev_thread = threading.Thread(target=run_device,
                                          name="ris-device-chain")
            dev_thread.start()

        if host_qids:
            t0 = _time.time()
            with cf.ThreadPoolExecutor(threads) as ex:
                futs = {ex.submit(host_search, wave[k], *queries[k]):
                        wave[k] for k in host_qids}
                for f in cf.as_completed(futs):
                    results[futs[f]] = f.result()
            _calibrate("host", sum(pairs_by_q.get(q, 0)
                                   for q in host_qids),
                       _time.time() - t0)
        if dev_thread is not None:
            dev_thread.join()
            if dev_exc:  # device side failed: redo its queries on host
                with cf.ThreadPoolExecutor(threads) as ex:
                    futs = {ex.submit(host_search, wave[k], *queries[k]):
                            wave[k] for k in dev_qids}
                    for f in cf.as_completed(futs):
                        results[futs[f]] = f.result()
        done_q += len(wave)
        _progress(done_q, t_start)
