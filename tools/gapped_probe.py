"""Dev probe: time ONLY the device gapped stage at configurable block sizes.

Builds the post-mid hit stream on the host (native C++ stage-2 chain — fast)
so the device gapped kernel is measured in isolation, cold + warm.

Usage: python tools/gapped_probe.py [n_queries] [B1,B2,...]
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
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sizes = ([int(x) for x in sys.argv[2].split(",")]
             if len(sys.argv) > 2 else [4096, 8192, 16384])
    max_ext = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    wd = REPO / "tools" / "_bench_round"
    p = RisParams(input=str(wd / "q.fa"), output="/dev/null",
                  db_name=str(wd / "db_exact"), engine="tpu")
    p.load_db_params()
    names, seqs = fasta.read_fasta(p.input)
    seqs = seqs[:nq]
    chunks = store.load_chunks(p.db_name, p.hash_size)
    native.lib()

    from priblast_tpu.search import pipeline as pl

    t0 = time.perf_counter()
    queries = []
    for seq in seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(seq),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        queries.append((q_enc, native.sa_build(q_enc), q_acc, q_cond))
    print(f"host acc+sa {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    # host chain to post-ungapped hits (native stage 2), then threshold+mid
    parts, meta = [], []
    for qid, q in enumerate(queries):
        for cid, chunk in enumerate(chunks):
            parts.append(native.search_chunk(q[0], q[1], q[2], q[3],
                                             chunk, p, stage=2))
            meta.append((qid, cid))
    stream = pl._concat_groups(parts, meta)
    stream = pl.threshold_stage(stream, p)
    stream, seed_bps = pl.mid_stage(stream, queries, chunks, p, threads=2)
    print(f"host to post-mid ({len(stream)} hits) "
          f"{time.perf_counter() - t0:.2f}s", flush=True)

    qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                         [q[2] for q in queries], [q[3] for q in queries])
    dbpack = pl.DbPack(chunks)
    pl._hit_bases(stream, qpack, dbpack, chunks)
    for k in pl._STREAM_KEYS:
        stream.soa[f"pre_{k}"] = stream.soa[k].copy()

    from priblast_tpu.search.gapped import gapped_extend_flat_batch

    n = len(stream)
    soa = stream.soa
    for B in sizes:
        for rep in range(2):
            t0 = time.perf_counter()
            outs = []
            for o in range(0, n, B):
                ns = min(B, n - o)
                sub = {k: soa[k][o:o + ns]
                       for k in (*pl._STREAM_KEYS,
                                 "qb", "qab", "dbb", "aoff", "coff")}
                g, b, ov = gapped_extend_flat_batch(
                    sub, qpack.bufs, dbpack.bufs,
                    d=p.min_accessible_length,
                    dropout=p.drop_out_length_w_gap,
                    min_helix=p.min_helix_length, max_ext=max_ext,
                    dtype="float32", pad_to=B)
                outs.append((g, ov))
            dt = time.perf_counter() - t0
            novf = sum(int(ov.sum()) for _, ov in outs)
            print(f"B={B:6d} me={max_ext} rep{rep} {dt:8.2f}s "
                  f"({n / dt:8.0f} hits/s, ovf={novf})", flush=True)


if __name__ == "__main__":
    main()
