"""f32-churn report: compare TPU-engine ris output against the exact
(reference-parity) output on the same workload and quantify how many
predictions actually change (VERDICT round-1 item 5).

Usage: python tools/churn_report.py EXACT.txt TPU.txt [LABEL]
Appends a section to CHURN.md (creates it with a header if missing).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def parse(path: str):
    """{(query, target, basepairs): (acc_e, hyb_e, inter_e)} per hit line."""
    hits = {}
    with open(path) as f:
        lines = f.read().splitlines()
    for line in lines[3:]:
        parts = line.split(",")
        if len(parts) < 9:
            continue
        key = (parts[1], parts[3], parts[8])
        hits[key] = tuple(float(x) for x in parts[5:8])
    return hits


def report(exact_path: str, tpu_path: str, label: str) -> str:
    ex = parse(exact_path)
    tp = parse(tpu_path)
    common = set(ex) & set(tp)
    only_ex = set(ex) - set(tp)
    only_tp = set(tp) - set(ex)
    dmax = dsum = 0.0
    printed_changed = 0
    for k in common:
        d = max(abs(a - b) for a, b in zip(ex[k], tp[k]))
        dmax = max(dmax, d)
        dsum += d
        if any(f"{a:g}" != f"{b:g}" for a, b in zip(ex[k], tp[k])):
            printed_changed += 1
    n = max(len(ex), 1)
    lines = [
        f"## {label}",
        "",
        f"- exact hits: {len(ex)}, tpu hits: {len(tp)}",
        f"- hits only in exact (lost): {len(only_ex)} "
        f"({100 * len(only_ex) / n:.3f}%)",
        f"- hits only in tpu (gained): {len(only_tp)}",
        f"- common hits with any printed-energy change: {printed_changed} "
        f"({100 * printed_changed / max(len(common), 1):.2f}%)",
        f"- max |energy delta| on common hits: {dmax:.4g} kcal/mol "
        f"(mean {dsum / max(len(common), 1):.4g})",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    exact_path, tpu_path = sys.argv[1], sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else f"{exact_path} vs {tpu_path}"
    out = REPO / "CHURN.md"
    if not out.exists():
        out.write_text(
            "# f32 engine churn vs exact (reference-parity) output\n\n"
            "The TPU engine computes accessibilities in float32 on device; "
            "this shifts printed energies by the engine's noise floor and "
            "can flip hits sitting exactly on a threshold. Sections below "
            "quantify it per workload (hit identity = query, target, "
            "base-pair string).\n\n")
    with open(out, "a") as f:
        f.write(report(exact_path, tpu_path, label) + "\n")
    print(report(exact_path, tpu_path, label))


if __name__ == "__main__":
    main()
