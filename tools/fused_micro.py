"""Micro-probe: split the fused seed stage into put / lower / compile /
execute / readback with flushed timings, to locate the device-path wall.

Usage: python tools/fused_micro.py [n_queries] [B]
"""

from __future__ import annotations

import faulthandler
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

faulthandler.dump_traceback_later(180, repeat=True)

from priblast_tpu.ops import native  # noqa: E402
from priblast_tpu.utils import alphabet, fasta, store  # noqa: E402
from priblast_tpu.utils.params import RisParams  # noqa: E402


def t(msg, t0):
    t1 = time.perf_counter()
    print(f"{msg:36s} {t1 - t0:8.2f}s", flush=True)
    return time.perf_counter()


def main() -> None:
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    wd = REPO / "tools" / "_bench_round"
    p = RisParams(input=str(wd / "q.fa"), output="/dev/null",
                  db_name=str(wd / "db_exact"), engine="tpu")
    p.load_db_params()
    names, seqs = fasta.read_fasta(p.input)
    seqs = seqs[:nq]
    chunks = store.load_chunks(p.db_name, p.hash_size)
    native.lib()

    t0 = time.perf_counter()
    from priblast_tpu.search import fused, seed
    from priblast_tpu.search import pipeline as pl

    queries = []
    for s in seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(s),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(s, p.repeat_flag)
        queries.append((q_enc, native.sa_build(q_enc), q_acc, q_cond))
    t0 = t("host accessibility+sa", t0)

    qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                         [q[2] for q in queries], [q[3] for q in queries],
                         [q[1] for q in queries])
    dbpack = pl.DbPack(chunks)
    t0 = t("packs (device_put)", t0)

    cands = seed.seed_candidates(p, chunks, queries, threads=4)
    nc = sum(len(c["q_sp"]) for _, c in cands)
    t0 = t(f"seed DFS ({nc} cands)", t0)

    wb = fused._WaveBuffers(p, cands, qpack, dbpack, "float32")
    t0 = t(f"wave buffers put (tot={wb.tot} pairs)", t0)

    statics = (p.min_accessible_length, p.max_seed_length, wb.sbits,
               "float32", float(p.interaction_energy_threshold),
               p.drop_out_length_wo_gap)
    bufs = (wb.cand, wb.cum, wb.energy, qpack.sa, dbpack.sa_j,
            dbpack.start_pos_j, dbpack.seq_len_j, dbpack.abs_acc_off_j,
            dbpack.abs_cond_off_j, qpack.bufs, dbpack.bufs)
    cap = max(B // 4, 8)

    lowered = fused._fused_jit.lower(*statics, cap, B, np.int32(0),
                                     np.int32(wb.tot), *bufs)
    t0 = t("lower", t0)
    compiled = lowered.compile()
    t0 = t("compile", t0)

    tot_hits = 0
    for o in range(0, max(wb.tot, 1), B):
        out, cnt = compiled(np.int32(o), np.int32(wb.tot), *bufs)
        n = int(cnt)
        tot_hits += min(n, cap)
        t0 = t(f"block o={o} exec+count ({n} keep)", t0)
    res = {k: np.asarray(v) for k, v in out.items()}
    t0 = t(f"readback last block ({tot_hits} hits tot)", t0)

    # warm repeat: all blocks, end to end
    t0 = time.perf_counter()
    for o in range(0, max(wb.tot, 1), B):
        out, cnt = compiled(np.int32(o), np.int32(wb.tot), *bufs)
        _ = int(cnt)
        _ = {k: np.asarray(v) for k, v in out.items()}
    t0 = t("warm repeat all blocks", t0)


if __name__ == "__main__":
    main()
