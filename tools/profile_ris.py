"""Stage profiler for the exact ris chain (development tool).

Times: accessibility, SA build, seed(stage1), full chain for each query on
one thread, on the bench_ris workload (build it first with bench_ris.py).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from priblast_tpu.ops import native  # noqa: E402
from priblast_tpu.utils import alphabet, fasta, store  # noqa: E402
from priblast_tpu.utils.params import RisParams  # noqa: E402


def main() -> None:
    wd = REPO / "tools" / "_bench_ris"
    p = RisParams(input=str(wd / "q.fa"), output="/dev/null",
                  db_name=str(wd / "bench_db"))
    p.load_db_params()
    names, seqs = fasta.read_fasta(p.input)
    if len(sys.argv) > 1:
        seqs = seqs[: int(sys.argv[1])]
    chunks = store.load_chunks(p.db_name, p.hash_size)
    native.lib()

    t_acc = t_sa = t_seed = t_full = 0.0
    n_stage1 = n_final = 0
    for seq in seqs:
        t0 = time.perf_counter()
        q_acc, q_cond = native.raccess(
            alphabet.access_codes(seq), p.maximal_span,
            p.min_accessible_length)
        t1 = time.perf_counter()
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        q_sa = native.sa_build(q_enc)
        t2 = time.perf_counter()
        for chunk in chunks:
            pre = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunk, p,
                                      stage=1)
            n_stage1 += len(pre["q_sp"])
        t3 = time.perf_counter()
        for chunk in chunks:
            res = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunk, p)
            n_final += len(res["q_sp"])
        t4 = time.perf_counter()
        t_acc += t1 - t0
        t_sa += t2 - t1
        t_seed += t3 - t2
        t_full += t4 - t3

    nq = len(seqs)
    print(f"queries: {nq}, stage1 hits: {n_stage1}, final hits: {n_final}")
    print(f"accessibility: {t_acc:7.2f}s  ({t_acc/nq*1e3:7.1f} ms/q)")
    print(f"suffix array : {t_sa:7.2f}s  ({t_sa/nq*1e3:7.1f} ms/q)")
    print(f"seed+expand  : {t_seed:7.2f}s  ({t_seed/nq*1e3:7.1f} ms/q)")
    print(f"full chain   : {t_full:7.2f}s  ({t_full/nq*1e3:7.1f} ms/q)")
    print(f"  extend part: {t_full - t_seed:7.2f}s")


if __name__ == "__main__":
    main()
