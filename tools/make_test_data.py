"""Generate deterministic random RNA FASTA files for parity tests.

The sizes mirror the reference ladder in BASELINE.json (tiny single-process
config first). Sequences are uppercase ACGU with a sprinkling of N and
lowercase (repeat-masked) characters so encoder repeat-flag behavior is
exercised.
"""

import random
import sys
from pathlib import Path

ALPHA = "ACGU"


def make_seq(rng: random.Random, n: int, soft: bool = False) -> str:
    chars = []
    for _ in range(n):
        c = rng.choice(ALPHA)
        r = rng.random()
        if r < 0.01:
            c = "N"
        elif soft and r < 0.05:
            c = c.lower()
        chars.append(c)
    return "".join(chars)


def write_fasta(path: Path, seqs, width: int = 70) -> None:
    with open(path, "w") as f:
        for name, seq in seqs:
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")


def main(outdir: str) -> None:
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)

    rng = random.Random(20240817)
    db = [(f"target_mRNA_{i}", make_seq(rng, rng.randint(150, 420))) for i in range(8)]
    write_fasta(out / "tiny_db.fa", db)

    q = [(f"query_lncRNA_{i}", make_seq(rng, rng.randint(200, 350))) for i in range(3)]
    write_fasta(out / "tiny_q.fa", q)

    rng = random.Random(7)
    db2 = [(f"t{i}", make_seq(rng, rng.randint(300, 1200), soft=True)) for i in range(40)]
    write_fasta(out / "small_db.fa", db2)
    q2 = [(f"q{i}", make_seq(rng, rng.randint(400, 1500), soft=True)) for i in range(10)]
    write_fasta(out / "small_q.fa", q2)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/data")
