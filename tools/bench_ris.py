"""Scratch ris benchmark driver (development tool).

Builds a realistic workload (db: mRNA-sized targets; queries: lncRNA-sized),
constructs the db once with the exact engine (byte-parity files), then times
the ris step on: the reference binary, the exact engine, and the TPU paths.

Usage: python tools/bench_ris.py [--nq 100] [--db-nt 5000] [--ndb 20]
       [--paths ref,exact,tpu,tpu_dev]
"""

from __future__ import annotations

import argparse
import os
import random
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def make_seq(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("ACGU") for _ in range(n))


def write_fasta(path: Path, seqs, width: int = 70) -> None:
    with open(path, "w") as f:
        for name, seq in seqs:
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i: i + width] + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=100)
    ap.add_argument("--q-nt", type=int, default=1000)
    ap.add_argument("--ndb", type=int, default=20)
    ap.add_argument("--db-nt", type=int, default=5000)
    ap.add_argument("--paths", default="ref,exact,tpu")
    ap.add_argument("--workdir", default="")
    ns = ap.parse_args()

    wd = Path(ns.workdir or (REPO / "tools" / "_bench_ris"))
    wd.mkdir(parents=True, exist_ok=True)
    rng = random.Random(42)
    dbfa = wd / "db.fa"
    qfa = wd / "q.fa"
    tag = f"{ns.ndb}x{ns.db_nt}_{ns.nq}x{ns.q_nt}"
    if not (wd / f"made_{tag}").exists():
        write_fasta(dbfa, [(f"t{i}", make_seq(rng, ns.db_nt + rng.randint(-200, 200)))
                           for i in range(ns.ndb)])
        write_fasta(qfa, [(f"q{i}", make_seq(rng, ns.q_nt + rng.randint(-100, 100)))
                          for i in range(ns.nq)])
        for p in wd.glob("made_*"):
            p.unlink()
        for p in wd.glob("db_built*"):
            p.unlink()
        (wd / f"made_{tag}").touch()

    # build db once (exact engine = byte parity with the reference)
    if not (wd / "db_built").exists():
        from priblast_tpu.models import db as db_model
        from priblast_tpu.utils.params import DbParams

        t0 = time.time()
        db_model.run(DbParams(input=str(dbfa), db_name=str(wd / "bench_db"),
                              engine="exact"))
        print(f"db build (exact): {time.time() - t0:.1f}s")
        (wd / "db_built").touch()

    paths = ns.paths.split(",")
    results = {}

    if "ref" in paths:
        sys.path.insert(0, str(REPO))
        import bench

        refbin = bench.build_reference()
        if refbin is None:
            print("reference binary unavailable")
        else:
            env = dict(os.environ, OMP_NUM_THREADS=str(os.cpu_count() or 1))
            t0 = time.time()
            subprocess.run([str(refbin), "ris", "-i", str(qfa), "-o",
                            str(wd / "ref_out.txt"), "-d", str(wd / "bench_db")],
                           check=True, capture_output=True, env=env, cwd=wd)
            results["ref"] = time.time() - t0

    def run_py(tag: str, engine: str, dev_extend: bool) -> float:
        from priblast_tpu.models import ris as ris_model
        from priblast_tpu.utils.params import RisParams

        env0 = os.environ.get("PRIBLAST_DEVICE_EXTEND")
        os.environ["PRIBLAST_DEVICE_EXTEND"] = "1" if dev_extend else "0"
        try:
            p = RisParams(input=str(qfa), output=str(wd / f"{tag}_out.txt"),
                          db_name=str(wd / "bench_db"), engine=engine)
            t0 = time.time()
            ris_model.run(p)
            return time.time() - t0
        finally:
            if env0 is None:
                os.environ.pop("PRIBLAST_DEVICE_EXTEND", None)
            else:
                os.environ["PRIBLAST_DEVICE_EXTEND"] = env0

    if "exact" in paths:
        results["exact"] = run_py("exact", "exact", False)
    if "tpu" in paths:
        results["tpu"] = run_py("tpu", "tpu", True)   # device extends (default)
    if "tpu_host" in paths:
        results["tpu_host"] = run_py("tpu_host", "tpu", False)

    print(f"workload: {ns.nq} queries x ~{ns.q_nt}nt vs "
          f"{ns.ndb} targets x ~{ns.db_nt}nt")
    for k, v in results.items():
        print(f"{k:8s} {v:8.2f}s   {ns.nq / v:8.2f} queries/s")

    # compare outputs (line sets; order differs across engines is a bug)
    outs = {k: (wd / f"{k}_out.txt") for k in results if k != "ref"}
    if "ref" in results:
        outs["ref"] = wd / "ref_out.txt"
    texts = {k: p.read_text() for k, p in outs.items() if p.exists()}
    keys = sorted(texts)
    for i in range(1, len(keys)):
        a, b = keys[0], keys[i]
        same = texts[a] == texts[b]
        print(f"output {b} == {a}: {same}"
              + ("" if same else f"  ({len(texts[a].splitlines())} vs "
                 f"{len(texts[b].splitlines())} lines)"))


if __name__ == "__main__":
    main()
