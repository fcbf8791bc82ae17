"""Command-line interface: `python -m priblast_tpu {db|ris} ...`.

Flags mirror the reference CLI (reference: src/main.cpp:36-111,
src/db_construction_parameters.cpp:32-78,
src/rna_interaction_search_parameters.cpp:33-95) plus `--engine` to select
the exact CPU engine or the TPU engine.
"""

from __future__ import annotations

import argparse
import sys

from priblast_tpu.utils.params import DbParams, RisParams


def _db_parser(sub) -> None:
    q = sub.add_parser("db", help="construct an interaction database")
    q.add_argument("-i", dest="input", required=True, help="input FASTA")
    q.add_argument("-o", dest="db_name", default="", help="output db name")
    q.add_argument("-r", dest="repeat_flag", type=int, default=0,
                   help="repeat mask: 0 hard, 1 soft, 2 none")
    q.add_argument("-s", dest="hash_size", type=int, default=8)
    q.add_argument("-w", dest="maximal_span", type=int, default=70)
    q.add_argument("-d", dest="min_accessible_length", type=int, default=5)
    q.add_argument("-c", dest="chunk_size", type=int, default=2**31 - 1,
                   help="db page size (sequences per page)")
    q.add_argument("-a", dest="algorithm", default="heap",
                   choices=["block", "heap", "dynamic"],
                   help="multi-process sequence distribution strategy "
                        "(single-process runs schedule dynamically)")
    q.add_argument("-p", dest="tmp_path", default="",
                   help="directory for multi-process part files")
    q.add_argument("--engine", dest="engine", default="auto",
                   choices=["auto", "exact", "tpu"])
    q.add_argument("--threads", dest="threads", type=int, default=0)


def _ris_parser(sub) -> None:
    q = sub.add_parser("ris", help="search RNA interactions against a db")
    q.add_argument("-i", dest="input", required=True, help="query FASTA")
    q.add_argument("-o", dest="output", required=True, help="output CSV")
    q.add_argument("-d", dest="db_name", required=True, help="database name")
    q.add_argument("-l", dest="max_seed_length", type=int, default=20)
    q.add_argument("-e", dest="hybrid_energy_threshold", type=float,
                   default=-6.0)
    q.add_argument("-f", dest="interaction_energy_threshold", type=float,
                   default=-4.0)
    q.add_argument("-g", dest="final_threshold", type=float, default=-8.0)
    q.add_argument("-x", dest="drop_out_length_w_gap", type=int, default=16)
    q.add_argument("-y", dest="drop_out_length_wo_gap", type=int, default=5)
    q.add_argument("-m", dest="min_helix_length", type=int, default=3)
    q.add_argument("-s", dest="output_style", type=int, default=0)
    q.add_argument("-a", dest="algorithm", default="area",
                   choices=["block", "area", "dynamic"],
                   help="multi-process query distribution strategy "
                        "(single-process runs schedule dynamically)")
    q.add_argument("-p", dest="tmp_path", default="",
                   help="directory for multi-process part files")
    q.add_argument("--engine", dest="engine", default="auto",
                   choices=["auto", "exact", "tpu"])
    q.add_argument("--dtype", dest="dtype", default="float32",
                   choices=["float32", "float64"],
                   help="device-kernel dtype: float64 gives ~1e-9 kcal/mol "
                        "agreement with --engine exact at device scale")
    q.add_argument("--threads", dest="threads", type=int, default=0)


def _apply_platform() -> None:
    """Honor PRIBLAST_PLATFORM (cpu/tpu/...) through the config API, which
    wins over site hooks that re-pin the JAX_PLATFORMS env variable."""
    import os

    plat = os.environ.get("PRIBLAST_PLATFORM", "")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="priblast_tpu")
    sub = ap.add_subparsers(dest="mode", required=True)
    _db_parser(sub)
    _ris_parser(sub)
    ns = ap.parse_args(argv)
    _apply_platform()

    if ns.mode == "db":
        from priblast_tpu.models import db

        fields = {f.name for f in DbParams.__dataclass_fields__.values()}
        p = DbParams(**{k: v for k, v in vars(ns).items() if k in fields})
        db.run(p)
    else:
        from priblast_tpu.models import ris

        fields = {f.name for f in RisParams.__dataclass_fields__.values()}
        p = RisParams(**{k: v for k, v in vars(ns).items() if k in fields})
        ris.run(p, threads=ns.threads or None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
