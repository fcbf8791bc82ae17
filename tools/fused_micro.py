"""Probe the fused seed stage (v2 path) end to end on the bench workload:
per-block stage timings come from PRIBLAST_FUSED_TIMINGS=1 inside
search/fused.py. Usage: python tools/fused_micro.py [n_queries]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("PRIBLAST_FUSED_TIMINGS", "1")

from priblast_tpu.ops import native  # noqa: E402
from priblast_tpu.utils import alphabet, fasta, store  # noqa: E402
from priblast_tpu.utils.params import RisParams  # noqa: E402


def main() -> None:
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    wd = REPO / "tools" / "_bench_round"
    p = RisParams(input=str(wd / "q.fa"), output="/dev/null",
                  db_name=str(wd / "db_exact"), engine="tpu")
    p.load_db_params()
    names, seqs = fasta.read_fasta(p.input)
    seqs = seqs[:nq]
    chunks = store.load_chunks(p.db_name, p.hash_size)
    native.lib()

    from priblast_tpu.search import fused, seed
    from priblast_tpu.search import pipeline as pl

    queries = []
    for s in seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(s),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(s, p.repeat_flag)
        queries.append((q_enc, native.sa_build(q_enc), q_acc, q_cond))
    qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                         [q[2] for q in queries], [q[3] for q in queries],
                         [q[1] for q in queries])
    dbpack = pl.DbPack(chunks)
    cands = seed.seed_candidates(p, chunks, queries, threads=2)
    npairs = sum(int(((c["db_sp"] - c["q_sp"] + 1).astype(np.int64)
                      * (c["db_len"] - c["q_len"] + 1)).sum())
                 for _, c in cands)
    stream = fused.fused_stage(p, cands, qpack, dbpack)
    print(f"cold done: pairs={npairs} hits={len(stream)}", flush=True)
    for rep in range(2):
        t0 = time.perf_counter()
        stream = fused.fused_stage(p, cands, qpack, dbpack)
        dt = time.perf_counter() - t0
        print(f"warm {dt:.2f}s ({npairs / dt / 1e3:.0f}k pairs/s)",
              flush=True)


if __name__ == "__main__":
    main()
