"""Database-construction pipeline (the reference's `db` step;
src/db_construction.cpp:37-83).

Stages:
  1. read FASTA
  2. per-sequence accessibility DP (exact CPU engine, or the batched TPU
     engine when selected) — the hot stage, ~95% of db time
  3. search-encode all sequences (reversed + sentinels)
  4. per page of `chunk_size` sequences: suffix array + k-mer hash
  5. write .bas/.seq/.ind/.acc/.nam (byte-compatible with the reference)

Host parallelism replaces the reference's MPI rank distribution: sequences
are processed in descending-length order (LPT) across a thread pool; output
files are always written in original FASTA order, so results are independent
of the parallel schedule.
"""

from __future__ import annotations

import concurrent.futures as cf
import os

import numpy as np

from priblast_tpu.ops import native
from priblast_tpu.utils import alphabet, fasta, store
from priblast_tpu.utils import profiling as prof
from priblast_tpu.utils.params import DbParams


def compute_accessibilities_exact(seqs: list[str], w: int, d: int,
                                  threads: int | None = None):
    """Exact per-sequence accessibility, parallel over sequences (LPT order)."""
    n = len(seqs)
    accs: list[np.ndarray | None] = [None] * n
    conds: list[np.ndarray | None] = [None] * n
    order = native.argsort_desc([len(s) for s in seqs])
    native.lib()  # build/load + set params once before forking threads

    def work(idx: int) -> None:
        acc, cond = native.raccess(alphabet.access_codes(seqs[idx]), w, d)
        nn = len(seqs[idx])
        accs[idx] = acc[: max(nn - d + 1, 0)]
        conds[idx] = cond

    threads = threads or min(32, os.cpu_count() or 1)
    if threads > 1 and n > 1:
        with cf.ThreadPoolExecutor(threads) as ex:
            list(ex.map(work, [int(i) for i in order]))
    else:
        for i in order:
            work(int(i))
    return accs, conds


def resolve_engine(engine: str) -> str:
    """auto -> the TPU engine when an accelerator is present, the exact CPU
    engine otherwise. The TPU engine's f32 accessibility deviates from the
    reference by ~1e-4..5e-3 kcal/mol, which can flip rare borderline hits
    (quantified in CHURN.md); --engine exact keeps byte parity."""
    if engine != "auto":
        return engine
    try:
        import jax

        return "exact" if jax.default_backend() == "cpu" else "tpu"
    except Exception:
        return "exact"


def run(p: DbParams) -> None:
    from priblast_tpu.parallel import multihost

    pidx, pcount = multihost.init_from_env()
    p.validate()
    names, seqs = fasta.read_fasta(p.input)

    if pcount > 1:
        mine = sorted(multihost.partition_for(
            p.algorithm, [len(s) for s in seqs], pcount)[pidx])
        my_seqs = [seqs[i] for i in mine]
    else:
        mine = list(range(len(seqs)))
        my_seqs = seqs

    with prof.stage("db.accessibility"):
        if resolve_engine(p.engine) == "tpu":
            from priblast_tpu.models import db_tpu
            from priblast_tpu.parallel import dist

            accs, conds = db_tpu.compute_accessibilities(
                my_seqs, p.maximal_span, p.min_accessible_length,
                mesh=dist.maybe_mesh())
        else:
            accs, conds = compute_accessibilities_exact(
                my_seqs, p.maximal_span, p.min_accessible_length)

    if pcount > 1:
        # gather accessibility shards to process 0 (the analog of the
        # reference's gather-to-one-rank before the index build,
        # src/db_construction.cpp:239-328)
        multihost.write_acc_part(
            multihost.part_path(p.db_name, p.tmp_path, pidx),
            {i: accs[k] for k, i in enumerate(mine)},
            {i: conds[k] for k, i in enumerate(mine)})
        multihost.barrier("db_acc_parts")
        if pidx != 0:
            return
        accs, conds = multihost.read_acc_parts(
            [multihost.part_path(p.db_name, p.tmp_path, q)
             for q in range(pcount)], len(seqs))
        for q in range(pcount):
            multihost.part_path(p.db_name, p.tmp_path, q).unlink()

    prof.maybe_report()
    encoded_each = [alphabet.encode_db([s], p.repeat_flag) for s in seqs]
    sizes = np.array([len(s) for s in seqs], dtype=np.int32)

    n = len(seqs)
    chunk = p.chunk_size
    num_chunks = max(1, (n + chunk - 1) // chunk)
    for ci in range(num_chunks):
        lo, hi = ci * chunk, min(n, (ci + 1) * chunk)
        enc = np.concatenate(encoded_each[lo:hi]) if hi > lo else np.zeros(0, np.uint8)
        sa = native.sa_build(enc)
        hstart, hend = native.kmer_hash(enc, sa, p.hash_size)
        store.append_ind_chunk(p.db_name, sa, hstart, hend, first=(ci == 0))
        store.append_seq_chunk(p.db_name, sizes[lo:hi], enc, first=(ci == 0))

    store.write_acc(p.db_name, accs, conds)
    store.write_nam(p.db_name, names)
    store.write_bas(p.db_name, p.hash_size, p.repeat_flag, p.maximal_span,
                    p.min_accessible_length)
