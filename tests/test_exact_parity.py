"""End-to-end byte parity of the exact CPU engine against golden outputs
produced by the reference implementation (single process, single thread).

Golden files live in tests/golden/{tiny,small}; regenerate with the
reference binary (tools/refbin, built via tools/mpi_shim) if test data
changes.
"""

import filecmp

import pytest

from priblast_tpu.models import db as db_model
from priblast_tpu.models import ris as ris_model
from priblast_tpu.utils.params import DbParams, RisParams

CASES = [
    # (name, db_fa, q_fa, repeat_flag)
    ("tiny", "tiny_db.fa", "tiny_q.fa", 0),
    ("small", "small_db.fa", "small_q.fa", 2),
]


@pytest.fixture(scope="module", params=CASES, ids=lambda c: c[0])
def built_db(request, tmp_path_factory, data_dir, golden_dir):
    name, db_fa, q_fa, repeat = request.param
    tmp = tmp_path_factory.mktemp(f"db_{name}")
    db_name = str(tmp / f"{name}_db")
    db_model.run(DbParams(input=str(data_dir / db_fa), db_name=db_name,
                          repeat_flag=repeat, algorithm="block"))
    return name, db_name, str(data_dir / q_fa), golden_dir / name, tmp


def test_db_files_byte_identical(built_db):
    name, db_name, _, golden, _ = built_db
    for ext in ("bas", "seq", "ind", "acc", "nam"):
        assert filecmp.cmp(f"{golden}/{name}_db.{ext}", f"{db_name}.{ext}",
                           shallow=False), f".{ext} differs"


@pytest.mark.parametrize("style", [0, 1])
def test_predictions_byte_identical(built_db, style):
    name, db_name, q_fa, golden, tmp = built_db
    out = str(tmp / f"pred_{style}.txt")
    p = RisParams(input=q_fa, output=out, db_name=db_name,
                  output_style=style, algorithm="block")
    ris_model.run(p)
    ref = golden / ("predictions.txt" if style == 0 else "predictions_style1.txt")
    mine = open(out).read().splitlines()
    want = open(ref).read().splitlines()
    # the header's input path differs by construction; compare from line 2 on,
    # and check the non-path parts of the header
    assert mine[0] == want[0]
    assert mine[1].split(",", 2)[2] == want[1].split(",", 2)[2]
    assert mine[2] == want[2]
    assert mine[3:] == want[3:]


def test_paginated_db_and_ris(tmp_path, data_dir):
    """Pagination (-c) must produce the same predictions as the reference's
    paginated run; db files are chunked identically (here validated by
    building chunked vs unchunked and comparing search results, plus the
    .seq/.ind chunk structure parsing round trip)."""
    from priblast_tpu.utils import store

    db_a = str(tmp_path / "whole")
    db_b = str(tmp_path / "paged")
    db_model.run(DbParams(input=str(data_dir / "tiny_db.fa"), db_name=db_a,
                          algorithm="block"))
    db_model.run(DbParams(input=str(data_dir / "tiny_db.fa"), db_name=db_b,
                          algorithm="block", chunk_size=3))
    chunks = store.load_chunks(db_b, 8)
    assert len(chunks) == 3  # 8 seqs in pages of 3
    assert sum(c.n_seqs for c in chunks) == 8

    out_a = str(tmp_path / "a.txt")
    out_b = str(tmp_path / "b.txt")
    ris_model.run(RisParams(input=str(data_dir / "tiny_q.fa"), output=out_a,
                            db_name=db_a, algorithm="block"))
    ris_model.run(RisParams(input=str(data_dir / "tiny_q.fa"), output=out_b,
                            db_name=db_b, algorithm="block"))
    a = open(out_a).read().splitlines()
    b = open(out_b).read().splitlines()
    assert a[2:] == b[2:]  # same hits; header db names differ


def test_soft_mask_db_files(tmp_path, data_dir, golden_dir):
    """repeat_flag=1 (soft mask) database files must be byte-identical;
    (ris on soft-masked data exercises reference UB in base-pair recording
    and is intentionally not golden-tested — see DESIGN.md)."""
    import filecmp

    db_name = str(tmp_path / "soft_db")
    db_model.run(DbParams(input=str(data_dir / "small_db.fa"),
                          db_name=db_name, repeat_flag=1, algorithm="block"))
    for ext in ("bas", "seq", "ind", "acc", "nam"):
        assert filecmp.cmp(f"{golden_dir}/soft/soft_db.{ext}",
                           f"{db_name}.{ext}", shallow=False), ext
