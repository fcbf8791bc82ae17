"""Dev probe: run the TPU ris pipeline stage by stage with flushed timings.

Usage: python tools/stage_probe.py [n_queries] [expand|ungapped|mid|gapped|finish]
Stops after the named stage (default: all).
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


def t(msg, t0):
    t1 = time.perf_counter()
    print(f"{msg:28s} {t1 - t0:8.2f}s", flush=True)
    return time.perf_counter()


def main() -> None:
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    upto = sys.argv[2] if len(sys.argv) > 2 else "finish"
    if upto == "fused":
        return fused_main(nq)
    wd = REPO / "tools" / "_bench_round"
    p = RisParams(input=str(wd / "q.fa"), output="/dev/null",
                  db_name=str(wd / "db_exact"), engine="tpu")
    p.load_db_params()
    names, seqs = fasta.read_fasta(p.input)
    seqs = seqs[:nq]
    chunks = store.load_chunks(p.db_name, p.hash_size)
    native.lib()

    t0 = time.perf_counter()
    from priblast_tpu.search import pipeline as pl
    from priblast_tpu.search import seed

    queries = []
    for seq in seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(seq),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        queries.append((q_enc, native.sa_build(q_enc), q_acc, q_cond))
    t0 = t("host accessibility+sa", t0)

    qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                         [q[2] for q in queries], [q[3] for q in queries],
                         [q[1] for q in queries])
    dbpack = pl.DbPack(chunks)
    t0 = t("packs", t0)

    cands = seed.seed_candidates(p, chunks, queries, threads=2)
    ncand = sum(len(c["q_sp"]) for _, c in cands)
    t0 = t(f"seed DFS ({ncand} cands)", t0)

    stream = seed.expand_stage(p, cands, qpack, dbpack)
    t0 = t(f"expand ({len(stream)} hits)", t0)
    if upto == "expand":
        return
    pl._hit_bases(stream, qpack, dbpack, chunks)
    t0 = t("hit bases", t0)

    pl.ungapped_stage(stream, qpack, dbpack, p)
    t0 = t("ungapped", t0)
    if upto == "ungapped":
        return

    stream = pl.threshold_stage(stream, p)
    t0 = t(f"threshold ({len(stream)} hits)", t0)
    stream, seed_bps = pl.mid_stage(stream, queries, chunks, p, threads=2)
    pl._hit_bases(stream, qpack, dbpack, chunks)
    for k in pl._STREAM_KEYS:
        stream.soa[f"pre_{k}"] = stream.soa[k].copy()
    t0 = t(f"mid ({len(stream)} hits)", t0)
    if upto == "mid":
        return

    bps = pl.gapped_stage(stream, seed_bps, qpack, dbpack, chunks, queries, p)
    t0 = t("gapped", t0)
    if upto == "gapped":
        return

    res = pl.finish_stage(stream, bps, queries, chunks, p, threads=2)
    nfin = sum(len(r["q_sp"]) for r in res)
    t0 = t(f"finish ({nfin} hits)", t0)


def fused_main(nq: int) -> None:
    """Probe the production fused path (pl.search_all) with stage timers and
    a second repeat to split compile-vs-execute."""
    import os

    os.environ["PRIBLAST_TIMINGS"] = "1"
    wd = REPO / "tools" / "_bench_round"
    p = RisParams(input=str(wd / "q.fa"), output="/dev/null",
                  db_name=str(wd / "db_exact"), engine="tpu")
    p.load_db_params()
    names, seqs = fasta.read_fasta(p.input)
    seqs = seqs[:nq]
    chunks = store.load_chunks(p.db_name, p.hash_size)
    native.lib()

    t0 = time.perf_counter()
    from priblast_tpu.search import pipeline as pl

    queries = []
    for seq in seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(seq),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        queries.append((q_enc, native.sa_build(q_enc), q_acc, q_cond))
    t0 = t("host accessibility+sa", t0)

    qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                         [q[2] for q in queries], [q[3] for q in queries],
                         [q[1] for q in queries])
    dbpack = pl.DbPack(chunks)
    t0 = t("packs", t0)

    for rep in range(2):
        stream, res = pl.search_all(p, chunks, queries, qpack, dbpack,
                                    threads=4)
        nfin = sum(len(r["q_sp"]) for r in res)
        t0 = t(f"search_all rep{rep} ({nfin} hits)", t0)
        from priblast_tpu.utils import profiling as prof
        print(prof.report(), flush=True)
        prof._times.clear()
        prof._counts.clear()


if __name__ == "__main__":
    main()
