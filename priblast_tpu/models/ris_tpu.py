"""TPU path of the ris step.

Query accessibilities are computed on-device in length-bucketed batches
(the per-query hot DP, reference: src/rna_interaction_search.cpp:175); the
seed-and-extend chain then runs on the host engine threads, overlapping with
the next accessibility batch. Hit semantics are identical to the exact
engine; only the accessibility values carry the f32 engine's ~1e-4 kcal/mol
deviation (use --engine exact for byte parity)."""

from __future__ import annotations

import concurrent.futures as cf
import os

import numpy as np

from priblast_tpu.models import db_tpu
from priblast_tpu.ops import native
from priblast_tpu.utils import alphabet
from priblast_tpu.utils.params import RisParams


def device_extend_enabled() -> bool:
    """Opt-in device extension chain (seed hits extended on-device via the
    batched ungapped + gapped kernels instead of the host engine threads).
    Off by default: the first TPU compile of the gapped DP is minutes (then
    disk-cached), and the host engine overlaps with accessibility batches."""
    return os.environ.get("PRIBLAST_DEVICE_EXTEND", "") not in ("", "0",
                                                                "false")


def run_queries(p: RisParams, chunks, names, seqs, order, results,
                threads: int | None = None) -> None:
    from priblast_tpu.accessibility.batched import BatchedRaccess

    engine = BatchedRaccess(p.maximal_span, p.min_accessible_length,
                            dtype="float32")
    native.lib()
    threads = threads or min(32, os.cpu_count() or 1)
    lengths = [len(s) for s in seqs]

    dev_extend = device_extend_enabled()
    cdevs = None
    if dev_extend:
        from priblast_tpu.search import chain as dchain

        cdevs = [dchain.ChunkDevice(c) for c in chunks]
        threads = 1  # device extends serialize on the chip anyway

    def search_one(idx: int, q_acc, q_cond):
        seq = seqs[idx]
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        q_sa = native.sa_build(q_enc)
        q_length = int(np.count_nonzero((q_enc >= 2) & (q_enc <= 5)))
        lines: list[str] = []
        from priblast_tpu.models.ris import format_hits

        if dev_extend:
            from priblast_tpu.search import chain as dchain

            qdev = dchain.QueryDevice(q_enc, q_acc, q_cond)
            for chunk, cdev in zip(chunks, cdevs):
                res = dchain.search_chunk_device(q_enc, q_sa, q_acc, q_cond,
                                                 chunk, p, qdev=qdev,
                                                 cdev=cdev)
                lines.extend(format_hits(p, res, chunk, names[idx], q_length))
            return lines
        for chunk in chunks:
            res = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunk, p)
            lines.extend(format_hits(p, res, chunk, names[idx], q_length))
        return lines

    with cf.ThreadPoolExecutor(threads) as ex:
        futs = {}
        for group, bsz, padded in db_tpu.plan_batches(lengths,
                                                      batch_size=16):
            codes = np.zeros((bsz, padded), np.uint8)
            lens = np.zeros(bsz, np.int32)
            for bi, idx in enumerate(group):
                codes[bi, : lengths[idx]] = alphabet.access_codes(seqs[idx])
                lens[bi] = lengths[idx]
            acc, cond = engine.run(codes, lens)
            for bi, idx in enumerate(group):
                ln = lengths[idx]
                qa = np.ascontiguousarray(acc[bi, :ln])
                qc = np.ascontiguousarray(cond[bi, :ln])
                futs[ex.submit(search_one, idx, qa, qc)] = idx
        for f in cf.as_completed(futs):
            results[futs[f]] = f.result()
