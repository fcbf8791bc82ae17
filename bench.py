"""Round benchmark: the north-star ris metric (queries/s/chip) plus db-step
throughput, vs the reference implementation on this host's CPU cores.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

- value: ris throughput in queries/second on the TPU engine (full pipeline:
  device accessibility DP + seed + device ungapped/gapped extensions + CSV
  output), measured on a 100-query x ~1k-nt vs 20-target x ~5k-nt workload
  after a warm-up run (jit compiles are disk-cached; steady state).
- vs_baseline: value / reference-binary throughput on the same workload and
  host (single process, all OpenMP threads). The reference binary is built
  on demand from /root/reference with the single-process MPI shim.
- vs_cluster_est: value / an extrapolation of the reference to the
  BASELINE.md bar (16 nodes x 16 cores, assuming linear scaling from this
  host's core count) — the honest comparison against the published
  deployment scale.
- db_nt_per_s / db_vs_baseline: db-step throughput (accessibility-dominated)
  on the TPU engine vs the reference binary, same convention.
"""

import json
import os
import random
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_Q, Q_LEN = 100, 1000
N_DB, DB_LEN = 20, 5000
CLUSTER_CORES = 256  # BASELINE.md: 16 nodes x 16 threads


def write_fasta(path: Path, seqs) -> int:
    total = 0
    with open(path, "w") as f:
        for name, seq in seqs:
            total += len(seq)
            f.write(f">{name}\n")
            for k in range(0, len(seq), 70):
                f.write(seq[k: k + 70] + "\n")
    return total


def make_workload(tmp: Path):
    rng = random.Random(123)

    def seq(n):
        n += rng.randint(-n // 25, n // 25)
        return "".join(rng.choice("ACGU") for _ in range(n))

    db_nt = write_fasta(tmp / "db.fa",
                        [(f"t{i}", seq(DB_LEN)) for i in range(N_DB)])
    q_nt = write_fasta(tmp / "q.fa",
                       [(f"q{i}", seq(Q_LEN)) for i in range(N_Q)])
    return db_nt, q_nt


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


def time_cmd(argv, cwd, env=None) -> float:
    t0 = time.time()
    subprocess.run(argv, check=True, capture_output=True,
                   env=env or dict(os.environ), cwd=cwd)
    return time.time() - t0


def main() -> None:
    from priblast_tpu.models import db as db_model
    from priblast_tpu.models import ris as ris_model
    from priblast_tpu.utils.params import DbParams, RisParams

    tmp = REPO / "tools" / "_bench_round"
    tmp.mkdir(parents=True, exist_ok=True)
    db_nt, _q_nt = make_workload(tmp)

    # --- db step, TPU engine (warm + timed)
    def tpu_db(tag):
        t0 = time.time()
        db_model.run(DbParams(input=str(tmp / "db.fa"),
                              db_name=str(tmp / f"db_tpu_{tag}"),
                              algorithm="block", engine="tpu"))
        return time.time() - t0

    tpu_db("warm")
    db_rate = db_nt / tpu_db("timed")

    # --- shared parity db for the search runs (byte-identical files)
    db_model.run(DbParams(input=str(tmp / "db.fa"),
                          db_name=str(tmp / "db_exact"),
                          algorithm="block", engine="exact"))

    # --- ris step, TPU engine (warm + timed)
    def tpu_ris(tag):
        p = RisParams(input=str(tmp / "q.fa"),
                      output=str(tmp / f"ris_{tag}.txt"),
                      db_name=str(tmp / "db_exact"), engine="tpu")
        t0 = time.time()
        ris_model.run(p)
        return time.time() - t0

    tpu_ris("warm")
    ris_qps = N_Q / tpu_ris("timed")

    # --- reference baselines (same host, all threads)
    ncores = os.cpu_count() or 1
    ref_db_rate = ref_qps = None
    refbin = build_reference()
    if refbin is not None:
        env = dict(os.environ, OMP_NUM_THREADS=str(ncores))
        try:
            ref_db_rate = db_nt / time_cmd(
                [str(refbin), "db", "-i", str(tmp / "db.fa"), "-o",
                 str(tmp / "db_ref"), "-a", "block"], tmp, env)
            ref_qps = N_Q / time_cmd(
                [str(refbin), "ris", "-i", str(tmp / "q.fa"), "-o",
                 str(tmp / "ris_ref.txt"), "-d", str(tmp / "db_exact")],
                tmp, env)
        except Exception:
            pass

    out = {
        "metric": "ris_queries_per_s_per_chip",
        "value": round(ris_qps, 3),
        "unit": "queries/s",
        "vs_baseline": (round(ris_qps / ref_qps, 2) if ref_qps else None),
        "workload": f"{N_Q}x{Q_LEN}nt queries vs {N_DB}x{DB_LEN}nt db",
        "ref_host_qps": round(ref_qps, 3) if ref_qps else None,
        "ref_host_cores": ncores,
        # linear-scaling extrapolation of the reference to the 16-node bar
        "vs_cluster_est": (round(ris_qps / (ref_qps * CLUSTER_CORES
                                            / ncores), 3)
                           if ref_qps else None),
        "db_nt_per_s": round(db_rate, 1),
        "db_vs_baseline": (round(db_rate / ref_db_rate, 2)
                           if ref_db_rate else None),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
