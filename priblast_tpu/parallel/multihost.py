"""Multi-host execution (jax.distributed) for the db and ris pipelines.

The reference distributes sequences across MPI ranks and merges outputs
with rank-ordered rings (SURVEY L4: src/fastafile_reader.cpp:135-314,
src/rna_interaction_search.cpp:202-230, src/db_construction.cpp:239-328).
The TPU-native replacement is single-controller-per-host JAX:

- every process reads the FASTA and takes the shard of sequence indices
  chosen by the `-a` distribution strategy (block / heap-LPT / area-sum;
  `dynamic` falls back to LPT — SPMD favors static balanced shards over a
  work-stealing counter);
- each process computes its shard with its local devices and writes one
  part file (the analog of the reference's per-rank temp files,
  src/utils.cpp:65-87), to `-p tmp_path` if given;
- a device barrier replaces the token ring, and process 0 merges the parts
  in global order (deterministic output, unlike the reference's
  completion-order chaining).

Activation: set PRIBLAST_NUM_PROCS / PRIBLAST_PROC_ID (+ optional
PRIBLAST_COORD, default localhost:9911) on every process, or pre-initialize
jax.distributed yourself. Single-process runs are unaffected.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_INITIALIZED = False


def init_from_env() -> tuple[int, int]:
    """Initialize jax.distributed from PRIBLAST_* env vars (idempotent).
    Returns (process_index, process_count)."""
    global _INITIALIZED
    nprocs = int(os.environ.get("PRIBLAST_NUM_PROCS", "0") or 0)
    if nprocs > 1 and not _INITIALIZED:
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ.get("PRIBLAST_COORD",
                                               "localhost:9911"),
            num_processes=nprocs,
            process_id=int(os.environ["PRIBLAST_PROC_ID"]))
        _INITIALIZED = True
    if nprocs <= 1:
        return 0, 1
    import jax

    return jax.process_index(), jax.process_count()


def barrier(name: str) -> None:
    """Cross-process barrier (replaces the reference's token ring,
    src/db_construction.cpp:591-610)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def partition_for(algorithm: str, lengths: list[int],
                  parts: int) -> list[list[int]]:
    """Sequence-index shards per process, by distribution strategy
    (reference `-a` flag; src/fastafile_reader.cpp:135-314)."""
    from priblast_tpu.utils import fasta

    if algorithm == "block":
        return fasta.partition_block(len(lengths), parts)
    if algorithm == "area":
        return fasta.partition_area(lengths, parts)
    # heap and dynamic: LPT (dynamic's work stealing has no SPMD analog;
    # LPT gives the same balancing intent statically)
    return fasta.partition_lpt(lengths, parts)


def part_path(output: str, tmp_path: str, pidx: int) -> Path:
    base = Path(tmp_path) if tmp_path else Path(output).parent
    base.mkdir(parents=True, exist_ok=True)
    return base / f"{Path(output).name}.part{pidx}"


# ---- ris: per-query result lines ----------------------------------------

def write_ris_part(path: Path, results: dict[int, list[str]]) -> None:
    """Framed text part file: '#q <query index> <n lines>' blocks."""
    with open(path, "w") as f:
        for idx in sorted(results):
            lines = results[idx]
            f.write(f"#q {idx} {len(lines)}\n")
            for line in lines:
                f.write(line + "\n")


def read_ris_parts(paths: list[Path]) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for path in paths:
        with open(path) as f:
            lines = f.read().splitlines()
        i = 0
        while i < len(lines):
            tag, idx, n = lines[i].split()
            assert tag == "#q"
            idx, n = int(idx), int(n)
            out[idx] = lines[i + 1: i + 1 + n]
            i += 1 + n
    return out


# ---- db: per-sequence accessibility arrays -------------------------------

def write_acc_part(path: Path, accs: dict[int, np.ndarray],
                   conds: dict[int, np.ndarray]) -> None:
    arrays = {}
    for idx, a in accs.items():
        arrays[f"a{idx}"] = a
        arrays[f"c{idx}"] = conds[idx]
    with open(path, "wb") as fh:  # exact path (savez would append .npz)
        np.savez(fh, **arrays)


def read_acc_parts(paths: list[Path], n: int):
    accs: list[np.ndarray | None] = [None] * n
    conds: list[np.ndarray | None] = [None] * n
    for path in paths:
        with np.load(path) as z:
            for key in z.files:
                idx = int(key[1:])
                if key[0] == "a":
                    accs[idx] = z[key]
                else:
                    conds[idx] = z[key]
    return accs, conds
