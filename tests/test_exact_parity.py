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
