#!/usr/bin/env python
"""Split a transcriptome FASTA into lncRNA and (other) RNA files by header
keyword — companion utility matching the reference's helper script
(reference: scripts/split_transcriptome.py:27-63).

Usage: python tools/split_transcriptome.py transcriptome.fa [keyword]

Writes <input>_lncRNA and <input>_RNA next to the input file; sequences
whose header contains the keyword (default "lncRNA") go to the first file.
"""

import sys
from pathlib import Path


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    path = Path(sys.argv[1])
    keyword = sys.argv[2] if len(sys.argv) > 2 else "lncRNA"

    out_l = open(f"{path}_lncRNA", "w")
    out_r = open(f"{path}_RNA", "w")
    cur = None
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                cur = out_l if keyword in line else out_r
            if cur is not None:
                cur.write(line)
    out_l.close()
    out_r.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
