"""Round benchmark: the north-star ris metric (queries/s/chip) plus db-step
throughput, vs the reference implementation on this host's CPU cores.

Fail-soft, progressive design: stdout carries ONLY JSON lines, one emitted
after every completed phase (cumulative — each line carries every metric
known so far, so the LAST line is always the most complete). Each phase runs
under its own deadline (signal.alarm); a phase that blows its budget is
recorded as null and the bench moves on instead of producing nothing.

Metrics:
- value / metric=ris_queries_per_s_per_chip: full ris pipeline throughput on
  the TPU engine (device accessibility DP + fused device seed-expansion/
  ungapped + device gapped extension + CSV output), measured on a 100-query
  x ~1k-nt vs 20-target x ~5k-nt workload after a warm-up run (jit compiles
  are disk-cached; steady state).
- vs_baseline: value / reference-binary throughput on the same workload and
  host (single process, all OpenMP threads). Built on demand from
  /root/reference with the single-process MPI shim; runs on CPU
  concurrently with the TPU warm-up so it costs no wall-clock.
- vs_cluster_est: value / linear extrapolation of the reference to the
  BASELINE.md deployment (16 nodes x 16 cores) — the honest comparison
  against the published scale.
- db_nt_per_s / db_vs_baseline: db-step throughput (accessibility-
  dominated), same convention.

Note on the first phase's budget: on tunneled single-chip hosts the first
device dispatch of a process can block for minutes in the device-claim
queue; the db phase budget absorbs it (claim_s is reported separately).
"""

import json
import os
import random
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_Q, Q_LEN = 100, 1000
N_DB, DB_LEN = 20, 5000
CLUSTER_CORES = 256  # BASELINE.md: 16 nodes x 16 threads


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class PhaseTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise PhaseTimeout


def phase_budget(name: str, default: int) -> int:
    return int(os.environ.get(f"PRIBLAST_BENCH_{name}_BUDGET", default))


class Bench:
    def __init__(self):
        self.out = {
            "metric": "ris_queries_per_s_per_chip",
            "value": None,
            "unit": "queries/s",
            "vs_baseline": None,
            "workload": (f"{N_Q}x{Q_LEN}nt queries vs {N_DB}x{DB_LEN}nt db, "
                         "dinucleotide-matched GENCODE-like (GC~0.47, CpG~0.35)"),
            "ref_host_qps": None,
            "ref_host_cores": os.cpu_count() or 1,
            "vs_cluster_est": None,
            "db_nt_per_s": None,
            "db_vs_baseline": None,
            "claim_s": None,
            "phases": {},
        }
        signal.signal(signal.SIGALRM, _alarm)

    def emit(self) -> None:
        print(json.dumps(self.out), flush=True)

    def phase(self, name: str, budget: int, fn) -> bool:
        t0 = time.time()
        signal.alarm(budget)
        try:
            fn()
            ok = True
        except PhaseTimeout:
            log(f"[bench] phase {name} exceeded {budget}s budget")
            ok = False
        except Exception as e:  # fail-soft: later phases may still work
            log(f"[bench] phase {name} failed: {type(e).__name__}: {e}")
            ok = False
        finally:
            signal.alarm(0)
        self.out["phases"][name] = round(time.time() - t0, 1)
        self.emit()
        return ok


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
    """Dinucleotide-frequency-matched GENCODE-like sequences (human
    transcript composition: ~47% GC, CpG odds ~0.35; tools/seqgen.py) —
    uniform-random ACGU is hit-dense to the point of distorting every
    stage ratio (round-3 VERDICT missing #2). The workload tag below
    records the composition so BENCH_r* lines are comparable."""
    sys.path.insert(0, str(REPO / "tools"))
    import numpy as np
    from seqgen import markov_batch

    rng0 = random.Random(123)
    nrng = np.random.default_rng(123)
    db_lens = [DB_LEN + rng0.randint(-DB_LEN // 25, DB_LEN // 25)
               for _ in range(N_DB)]
    q_lens = [Q_LEN + rng0.randint(-Q_LEN // 25, Q_LEN // 25)
              for _ in range(N_Q)]
    db_seqs = [s.tobytes().decode() for s in markov_batch(nrng, db_lens)]
    q_seqs = [s.tobytes().decode() for s in markov_batch(nrng, q_lens)]
    db_nt = write_fasta(tmp / "db.fa",
                        [(f"t{i}", s) for i, s in enumerate(db_seqs)])
    q_nt = write_fasta(tmp / "q.fa",
                       [(f"q{i}", s) for i, s in enumerate(q_seqs)])
    return db_nt, q_nt


_REF_FLAGS = ["-std=c++17", "-O3", "-march=native", "-flto", "-fopenmp"]


def build_reference() -> Path | None:
    out = REPO / "tools" / "refbin" / "pRIblast"
    # key the cached binary on the build flags: a stale baseline built at
    # older flags must not silently misreport vs_baseline ratios
    stamp = out.parent / "pRIblast.flags"
    want = " ".join(_REF_FLAGS)
    if out.exists() and stamp.exists() and stamp.read_text() == want:
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    src = Path("/root/reference/src")
    if not src.exists():
        # no source to rebuild from: a cached binary is only trustworthy if
        # its flags stamp matches (else vs_baseline would silently compare
        # against a stale-flags build — the case the stamp exists to catch)
        log("[bench] reference src missing and no matching cached binary; "
            "baseline unavailable")
        return None
    try:
        # the reference's own release flags (reference Makefile:6) — the
        # honest baseline; goldens are generated separately at -O2 where
        # the fmath/expd paths stay deterministic SSE2
        subprocess.run(
            ["g++", *_REF_FLAGS,
             "-I", str(REPO / "tools" / "mpi_shim"),
             "-o", str(out)] + [str(p) for p in sorted(src.glob("*.cpp"))],
            check=True, capture_output=True, timeout=600)
        stamp.write_text(want)
        return out
    except Exception as e:
        log(f"[bench] reference build failed: {e}")
        return None


def main() -> None:
    bench = Bench()
    out = bench.out
    tmp = REPO / "tools" / "_bench_round"
    tmp.mkdir(parents=True, exist_ok=True)
    db_nt, _q_nt = make_workload(tmp)

    # --- reference baseline: runs on CPU in the background while the TPU
    # claim + warm-up proceeds in this process (2-core host: the subprocess
    # competes only with the mostly-idle claim wait)
    ref_script = tmp / "_ref_times.json"
    ref_proc = None
    refbin = build_reference()
    if refbin is not None:
        ref_runner = (
            "import json,subprocess,time,os,sys\n"
            f"tmp={str(tmp)!r}; b={str(refbin)!r}\n"
            "env=dict(os.environ,OMP_NUM_THREADS=str(os.cpu_count() or 1))\n"
            "def t(argv):\n"
            "    t0=time.time()\n"
            "    subprocess.run(argv,check=True,capture_output=True,"
            "env=env,cwd=tmp)\n"
            "    return time.time()-t0\n"
            "r={}\n"
            "r['db']=t([b,'db','-i',tmp+'/db.fa','-o',tmp+'/db_ref',"
            "'-a','block'])\n"
            "r['ris']=t([b,'ris','-i',tmp+'/q.fa','-o',tmp+'/ris_ref.txt',"
            "'-d',tmp+'/db_ref'])\n"
            f"json.dump(r,open({str(ref_script)!r},'w'))\n")
        ref_script.unlink(missing_ok=True)
        ref_proc = subprocess.Popen([sys.executable, "-c", ref_runner],
                                    stdout=subprocess.DEVNULL,
                                    stderr=subprocess.DEVNULL)

    from priblast_tpu.models import db as db_model
    from priblast_tpu.models import ris as ris_model
    from priblast_tpu.utils.params import DbParams, RisParams

    # --- phase: claim + db warm (first device dispatch pays the claim)
    def db_warm():
        t0 = time.time()
        db_model.run(DbParams(input=str(tmp / "db.fa"),
                              db_name=str(tmp / "db_tpu_warm"),
                              algorithm="block", engine="tpu"))
        out["claim_s"] = round(time.time() - t0, 1)  # includes claim+compile

    warmed = bench.phase("db_warm", phase_budget("DB_WARM", 3000), db_warm)

    # --- phase: join the reference baseline BEFORE the timed host-bound
    # phases — on a 2-core host the concurrent reference run contends with
    # our ris host stages and contaminates both measurements; db_warm
    # (device claim + compiles) is the only phase it can overlap freely
    def ref_join():
        if ref_proc is None:
            return
        ref_proc.wait(timeout=max(1, phase_budget("REF", 900) - 5))

    bench.phase("ref_join", phase_budget("REF", 900), ref_join)

    # --- phase: db timed
    def db_timed():
        t0 = time.time()
        db_model.run(DbParams(input=str(tmp / "db.fa"),
                              db_name=str(tmp / "db_tpu_timed"),
                              algorithm="block", engine="tpu"))
        out["db_nt_per_s"] = round(db_nt / (time.time() - t0), 1)

    if warmed:
        bench.phase("db_timed", phase_budget("DB_TIMED", 600), db_timed)

    # --- phase: parity db for the search runs (host engine, byte-identical)
    def db_exact():
        if not (tmp / "db_exact.bas").exists():
            db_model.run(DbParams(input=str(tmp / "db.fa"),
                                  db_name=str(tmp / "db_exact"),
                                  algorithm="block", engine="exact"))

    bench.phase("db_exact", phase_budget("DB_EXACT", 600), db_exact)

    # --- phase: ris warm (compiles the fused/gapped search programs once;
    # disk-cached for later runs)
    def tpu_ris(tag):
        p = RisParams(input=str(tmp / "q.fa"),
                      output=str(tmp / f"ris_{tag}.txt"),
                      db_name=str(tmp / "db_exact"), engine="tpu")
        t0 = time.time()
        ris_model.run(p)
        return time.time() - t0

    def ris_warm():
        tpu_ris("warm")

    ris_ok = bench.phase("ris_warm", phase_budget("RIS_WARM", 2400),
                         ris_warm)

    # --- phase: ris timed (the headline number)
    def ris_timed():
        out["value"] = round(N_Q / tpu_ris("timed"), 3)

    if ris_ok:
        bench.phase("ris_timed", phase_budget("RIS_TIMED", 1200), ris_timed)

    # --- phase: fill the reference ratios
    def ref_ratios():
        if not ref_script.exists():
            return
        r = json.load(open(ref_script))
        ncores = out["ref_host_cores"]
        if r.get("db"):
            ref_db_rate = db_nt / r["db"]
            if out["db_nt_per_s"]:
                out["db_vs_baseline"] = round(
                    out["db_nt_per_s"] / ref_db_rate, 2)
        if r.get("ris"):
            out["ref_host_qps"] = round(N_Q / r["ris"], 3)
            if out["value"]:
                out["vs_baseline"] = round(out["value"] / out["ref_host_qps"],
                                           2)
                out["vs_cluster_est"] = round(
                    out["value"] / (out["ref_host_qps"] * CLUSTER_CORES
                                    / ncores), 3)

    bench.phase("ref", phase_budget("REF", 60), ref_ratios)
    if ref_proc is not None and ref_proc.poll() is None:
        ref_proc.kill()

    bench.emit()


if __name__ == "__main__":
    main()
