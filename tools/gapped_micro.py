"""Micro-probe: time ONLY the compiled gapped_extend_device execution
(device arrays in, block_until_ready) vs the full flat_batch wrapper, to
split device-compute from host pack/transfer/readback cost.

Usage: python tools/gapped_micro.py [n_queries] [B] [max_ext]
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
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    max_ext = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    wd = REPO / "tools" / "_bench_round"
    p = RisParams(input=str(wd / "q.fa"), output="/dev/null",
                  db_name=str(wd / "db_exact"), engine="tpu")
    p.load_db_params()
    names, seqs = fasta.read_fasta(p.input)
    seqs = seqs[:nq]
    chunks = store.load_chunks(p.db_name, p.hash_size)
    native.lib()

    from priblast_tpu.search import pipeline as pl

    queries = []
    for seq in seqs:
        q_acc, q_cond = native.raccess(alphabet.access_codes(seq),
                                       p.maximal_span,
                                       p.min_accessible_length)
        q_enc = alphabet.encode_query(seq, p.repeat_flag)
        queries.append((q_enc, native.sa_build(q_enc), q_acc, q_cond))

    parts, meta = [], []
    for qid, q in enumerate(queries):
        for cid, chunk in enumerate(chunks):
            parts.append(native.search_chunk(q[0], q[1], q[2], q[3],
                                             chunk, p, stage=2))
            meta.append((qid, cid))
    stream = pl._concat_groups(parts, meta)
    stream = pl.threshold_stage(stream, p)
    stream, seed_bps = pl.mid_stage(stream, queries, chunks, p, threads=2)
    print(f"post-mid hits: {len(stream)}", flush=True)

    qpack = pl.QueryPack([q[0].astype(np.int32) for q in queries],
                         [q[2] for q in queries], [q[3] for q in queries])
    dbpack = pl.DbPack(chunks)
    pl._hit_bases(stream, qpack, dbpack, chunks)

    import jax

    from priblast_tpu.search import gapped as G

    soa = stream.soa
    n = len(stream)

    def pad(a, dtype_, fill=0):
        out = np.full(B, fill, dtype_)
        out[:B if n >= B else n] = a[:B] if n >= B else a
        return out

    q_sp = pad(soa["q_sp"], np.int32)
    db_sp = pad(soa["db_sp"], np.int32)
    db_len = pad(soa["db_len"], np.int32, 1)
    ids = pad(soa["dbseq_start"], np.int32)
    energy = pad(soa["energy"], np.float64)
    acc_e = pad(soa["acc_e"], np.float64)
    valid = np.zeros(B, bool)
    valid[:min(n, B)] = True
    dev = jax.devices()[0]
    put = lambda a: jax.device_put(a, dev)
    bases = [put(pad(soa[k], np.int32))
             for k in ("qb", "qab", "dbb", "aoff", "coff")]
    seqs_b = (qpack.bufs[0], dbpack.bufs[0], qpack.bufs[1], qpack.bufs[2],
              dbpack.bufs[1], dbpack.bufs[2])
    args = (put(q_sp), put(db_sp), put(ids + db_len - 1), put(energy),
            put(acc_e), put(valid), *bases, *seqs_b)
    kw = dict(flag=0, d=p.min_accessible_length,
              dropout=p.drop_out_length_w_gap,
              min_helix=p.min_helix_length, max_ext=max_ext,
              dtype="float32")

    t0 = time.perf_counter()
    r = G.gapped_extend_device(*args, **kw)
    _ = np.asarray(r["min_e"])  # force full sync (tunnel-safe)
    print(f"cold (compile+run): {time.perf_counter() - t0:8.2f}s", flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        r = G.gapped_extend_device(*args, **kw)
        _ = np.asarray(r["min_e"])
        dt = time.perf_counter() - t0
        print(f"warm exec rep{rep}: {dt * 1e3:9.1f} ms "
              f"({B / dt:9.0f} lanes/s)", flush=True)
    # readback cost of the full result dict
    t0 = time.perf_counter()
    out = {k: np.asarray(v) for k, v in r.items()}
    print(f"readback: {(time.perf_counter() - t0) * 1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
