"""Dynamic FD golden tests pinned to the reference's cases
(src/tests/unit/test_dynamic_fd_verifier.cpp on dynamic_fd/TestDynamicInit.csv
+ Insert/Update/delete-row configs). The reference's row-id deletes/updates are
expressed as value-level delta batches (update = delete old + insert new in the
same batch), which is what the cluster-map semantics reduce to
(dynamic_position_list_index.h:32-34)."""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from pyspark_validator.incremental import IncrementalFD

# dynamic_fd/TestDynamicInit.csv rows (string-typed)
INIT = [
    ("1", "1", "1", "1.233", "-", "1"),
    ("1", "1", "1", "0", "8", "2"),
    ("1", "1", "2.1", "0", "8", "3"),
    ("1", "2", "2", "hjkl", "444", "4"),
    ("1", "2", "2", "hjkl", "444", "4"),
    ("1", "2", "", "hjkl", "444", "5"),
    ("1", "3", "3", "0", "9", "6"),
    ("1", "3", "3", "0", "9", "6"),
    ("1", "3", "NULL", "999", "-", "7"),
    ("1", "4", "4", "hjkl", "555", "8"),
    ("1", "4", "4", "hjkl", "555", "8"),
    ("1", "4", "abc", "hjkl", "555", "9"),
]
# dynamic_fd/TestDynamicInsert.csv
INSERT = [
    ("1", "5", "5", "mnop", "10", "10"),
    ("1", "5", "5", "mnop", "10", "11"),
    ("1", "5", "666", "hjkl", "666", "11"),
]
# dynamic_fd/TestDynamicUpdate.csv: _id 0 and 4 replaced
UPDATE_OLD = [INIT[0], INIT[4]]
UPDATE_NEW = [
    ("2", "1", "1", "999", "-", "10"),
    ("1", "2", "2", "hjkl", "444", "5"),
]
DELETE_134_6 = [INIT[1], INIT[6], INIT[3]]  # reference delete rows {1, 6, 3}
COLS = [f"c{i}" for i in range(6)]


def _global(inc):
    v = inc.verdicts().agg(
        F.sum("n_rows").alias("n"),
        F.sum("n_error_clusters").alias("cl"),
        F.sum("n_error_rows").alias("rw"),
        F.sum("conflict_pairs").alias("cp"),
    ).collect()[0]
    err = Fraction(int(v.cp), int(v.n) * (int(v.n) - 1)) if v.n > 1 else Fraction(0)
    return int(v.cl), int(v.rw), err


# (lhs idx, rhs idx, inserts, update, deletes, clusters, rows, error)
GOLDEN = [
    ([0, 1, 2, 3, 4], [5], INSERT, None, None, 1, 2, Fraction(1, 105)),
    ([1, 2], [0, 3], None, None, DELETE_134_6, 0, 0, Fraction(0)),
    ([4], [3], None, (UPDATE_OLD, UPDATE_NEW), None, 0, 0, Fraction(0)),
    ([2, 4], [0, 1, 3, 5], INSERT, (UPDATE_OLD, UPDATE_NEW), None, 2, 4, Fraction(2, 105)),
    ([1], [2, 3], INSERT, None, DELETE_134_6, 5, 12, Fraction(7, 66)),
    ([1, 4], [2, 3, 5], None, (UPDATE_OLD, UPDATE_NEW), DELETE_134_6, 2, 5, Fraction(1, 12)),
    ([0, 1], [1, 4], INSERT, (UPDATE_OLD, UPDATE_NEW), DELETE_134_6, 2, 5, Fraction(1, 22)),
]


@pytest.mark.parametrize("lhs_i,rhs_i,ins,upd,dele,cl,rw,err", GOLDEN)
def test_dynamic_fd_reference_golden(spark, tmp_path, lhs_i, rhs_i, ins, upd, dele, cl, rw, err):
    lhs = [COLS[i] for i in lhs_i]
    rhs = [COLS[i] for i in rhs_i]
    inc = IncrementalFD(
        spark,
        str(tmp_path / f"dfd_{'_'.join(map(str, lhs_i + rhs_i))}"),
        lhs,
        rhs,
        num_partitions=4,
    )
    inc.initialize(spark.createDataFrame(INIT, COLS).select(*dict.fromkeys(lhs + rhs)))
    inserts = list(ins) if ins else []
    deletes = list(dele) if dele else []
    if upd:
        old, new = upd
        deletes += old
        inserts += new
    inc.apply_delta(
        inserts=(
            spark.createDataFrame(inserts, COLS).select(*dict.fromkeys(lhs + rhs)) if inserts else None
        ),
        deletes=(
            spark.createDataFrame(deletes, COLS).select(*dict.fromkeys(lhs + rhs)) if deletes else None
        ),
    )
    got_cl, got_rw, got_err = _global(inc)
    assert (got_cl, got_rw) == (cl, rw)
    assert got_err == err
