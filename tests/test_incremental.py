"""Incremental (dynamic) validation tests: delta batches must produce verdicts
identical to a full recompute over the post-delta table (the cross-validation
rule the reference applies between dynamic and static verifiers), and must only
rewrite touched partitions."""

import pytest
from pyspark.sql import functions as F

from pyspark_validator.checks.fd import fd_check
from pyspark_validator.checks.ucc import ucc_check
from pyspark_validator.incremental import IncrementalFD, IncrementalUCC


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


VERDICT_COLS = [
    "partition_id",
    "n_rows",
    "n_distinct",
    "n_violating_clusters",
    "n_violating_rows",
    "violating_pairs",
    "holds",
]


def test_incremental_ucc_matches_full_recompute(spark, tmp_path):
    base = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    inc = IncrementalUCC(spark, str(tmp_path / "ucc"), ["k"], num_partitions=8)
    inc.initialize(base)
    # baseline: unique -> all partitions hold
    v0 = inc.verdicts()
    assert all(r.holds for r in v0.collect())

    # delta: insert dup of 7, a fresh 200, delete 50
    ins = spark.createDataFrame([(7,), (200,)], ["k"])
    dele = spark.createDataFrame([(50,)], ["k"])
    touched = inc.apply_delta(inserts=ins, deletes=dele)
    # touched partitions only
    t_pids = {r.partition_id for r in touched.collect()}
    assert 0 < len(t_pids) <= 3

    # full recompute oracle on the post-delta table
    post = base.filter(F.col("k") != 50).unionByName(ins)
    full = ucc_check(post, ["k"], num_partitions=8).verdicts()
    assert _sorted_rows(inc.verdicts(), VERDICT_COLS) == _sorted_rows(
        full, VERDICT_COLS
    )
    # the duplicate is detected
    s = inc.verdicts().agg(F.sum("n_violating_clusters").alias("v")).collect()[0]
    assert s.v == 1


def test_incremental_ucc_delta_then_fix(spark, tmp_path):
    base = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    inc = IncrementalUCC(spark, str(tmp_path / "ucc2"), ["k"], num_partitions=4)
    inc.initialize(base)
    inc.apply_delta(inserts=spark.createDataFrame([(3,)], ["k"]))
    assert not all(r.holds for r in inc.verdicts().collect())
    # deleting one copy of the dup restores uniqueness everywhere
    inc.apply_delta(deletes=spark.createDataFrame([(3,)], ["k"]))
    assert all(r.holds for r in inc.verdicts().collect())
    assert inc.state.current_version() == 2


FD_VERDICT_COLS = [
    "partition_id",
    "n_rows",
    "n_distinct_x",
    "n_distinct_xy",
    "n_error_clusters",
    "n_error_rows",
    "conflict_pairs",
    "holds",
]


def test_incremental_fd_matches_full_recompute(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, i % 10, f"y{i % 10}") for i in range(100)], ["rid", "x", "y"]
    ).drop("rid")
    inc = IncrementalFD(spark, str(tmp_path / "fd"), ["x"], ["y"], num_partitions=8)
    inc.initialize(base)
    assert all(r.holds for r in inc.verdicts().collect())

    # break the FD for x=3 with a conflicting y; also delete one (5, y5) row
    ins = spark.createDataFrame([(3, "OTHER")], ["x", "y"])
    dele = spark.createDataFrame([(5, "y5")], ["x", "y"])
    inc.apply_delta(inserts=ins, deletes=dele)

    post = base.filter(~((F.col("x") == 5) & F.monotonically_increasing_id().isin([])))
    # build post table explicitly: remove ONE (5, y5) row
    rows = [(i % 10, f"y{i % 10}") for i in range(100)]
    rows.remove((5, "y5"))
    rows.append((3, "OTHER"))
    post = spark.createDataFrame(rows, ["x", "y"])
    full = fd_check(post, ["x"], ["y"], num_partitions=8).verdicts()
    assert _sorted_rows(inc.verdicts(), FD_VERDICT_COLS) == _sorted_rows(
        full, FD_VERDICT_COLS
    )


def test_incremental_requires_init(spark, tmp_path):
    inc = IncrementalUCC(spark, str(tmp_path / "none"), ["k"])
    with pytest.raises(ValueError, match="initialize"):
        inc.verdicts()


def test_incremental_fd_afd_measures_track_static(spark, tmp_path):
    """DynamicAFD analog: after delta batches, measures from state must equal a
    static afd_measures() over the post-delta table (the reference's
    dynamic_verifying_afd workflow)."""
    from pyspark_validator.checks.fd import fd_check as static_fd

    rows = [(i % 7, f"y{i % 3}") for i in range(60)]
    base = spark.createDataFrame(rows, ["x", "y"])
    inc = IncrementalFD(spark, str(tmp_path / "afd"), ["x"], ["y"], num_partitions=4)
    inc.initialize(base)
    inc.apply_delta(
        inserts=spark.createDataFrame([(1, "zz"), (2, "y0")], ["x", "y"]),
        deletes=spark.createDataFrame([(3, "y0")], ["x", "y"]),
    )
    post_rows = rows + [(1, "zz"), (2, "y0")]
    post_rows.remove((3, "y0"))
    post = spark.createDataFrame(post_rows, ["x", "y"])
    got = inc.afd_measures().collect()[0]
    exp = static_fd(post, ["x"], ["y"], num_partitions=4).afd_measures().collect()[0]
    for f in ["g1", "g2", "pdep", "tau", "mu_plus", "rho", "fi"]:
        assert float(got[f]) == pytest.approx(float(exp[f])), f
    assert (got.n_rows, got.n_distinct_x, got.n_distinct_xy) == (
        exp.n_rows,
        exp.n_distinct_x,
        exp.n_distinct_xy,
    )


def test_incremental_delta_rewrites_only_touched_partitions(spark, tmp_path):
    """The scale claim of the incremental engine: a delta must write ONLY the
    touched partition_id= directories; every untouched partition's files are
    carried into the new manifest by reference and stay byte-identical."""
    import json
    import os

    base = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    inc = IncrementalUCC(spark, str(tmp_path / "nrw"), ["k"], num_partitions=8)
    inc.initialize(base)
    st = inc.state
    man0 = st.manifest()
    assert len(man0) == 8 and all(rel.startswith("v0/") for rel in man0.values())
    snapshot = {}
    for pid, rel in man0.items():
        d = os.path.join(st.path, rel)
        snapshot[pid] = {
            f: (os.path.getmtime(p), os.path.getsize(p), open(p, "rb").read())
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
            for p in [os.path.join(d, f)]
        }

    touched_df = inc.apply_delta(inserts=spark.createDataFrame([(7,)], ["k"]))
    touched = {str(r.partition_id) for r in touched_df.collect()}
    assert len(touched) == 1

    man1 = st.manifest()
    # v1 holds only the touched partition; untouched entries are unchanged refs
    v1 = os.path.join(st.path, "v1")
    v1_parts = sorted(n for n in os.listdir(v1) if n.startswith("partition_id="))
    assert v1_parts == [f"partition_id={p}" for p in sorted(touched)]
    for pid, rel in man1.items():
        if pid in touched:
            assert rel.startswith("v1/")
        else:
            assert rel == man0[pid]
            d = os.path.join(st.path, rel)
            now = {
                f: (os.path.getmtime(p), os.path.getsize(p), open(p, "rb").read())
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
                for p in [os.path.join(d, f)]
            }
            assert now == snapshot[pid]

    # verdicts across versions still match a full recompute
    post = base.unionByName(spark.createDataFrame([(7,)], ["k"]))
    full = ucc_check(post, ["k"], num_partitions=8).verdicts()
    assert _sorted_rows(inc.verdicts(), VERDICT_COLS) == _sorted_rows(
        full, VERDICT_COLS
    )


def test_incremental_delete_all_rows_of_partition(spark, tmp_path):
    """A touched partition whose rows all delete out drops from the manifest
    and from verdicts (empty-partition edge of the manifest merge)."""
    base = spark.createDataFrame([(1,), (2,)], ["k"])
    inc = IncrementalUCC(spark, str(tmp_path / "empt"), ["k"], num_partitions=4)
    inc.initialize(base)
    n0 = inc.verdicts().count()
    inc.apply_delta(deletes=spark.createDataFrame([(1,)], ["k"]))
    assert inc.verdicts().count() == n0 - 1
    assert inc.verdicts().agg(F.sum("n_rows").alias("s")).collect()[0].s == 1


def test_state_vacuum_reference_based(spark, tmp_path):
    """vacuum keeps every file a retained manifest references (even in old
    version dirs -- carry-by-reference), deletes unreferenced dirs and old
    manifests, and never changes what read()/verdicts() return."""
    import os

    from pyspark_validator.incremental import IncrementalUCC

    eng = IncrementalUCC(spark, str(tmp_path / "s"), ["k"], num_partitions=4)
    eng.initialize(spark.createDataFrame([(i,) for i in range(20)], ["k"]))
    for i in range(3):  # each delta touches a subset of partitions
        eng.apply_delta(inserts=spark.createDataFrame([(100 + i,)], ["k"]))
    before = eng.verdicts().orderBy("partition_id").collect()
    st = eng.state
    manifests = [f for f in os.listdir(st.path) if f.startswith("manifest_v")]
    assert len(manifests) == 4

    stats = st.vacuum(keep_last=1)
    assert stats["manifests_deleted"] == 3
    assert stats["dirs_deleted"] >= 1  # superseded touched-partition dirs
    after = eng.verdicts().orderBy("partition_id").collect()
    assert before == after
    for rel in st.manifest().values():  # every live reference still on disk
        assert os.path.isdir(os.path.join(st.path, rel))

    # keep_last=2 retains the previous snapshot's manifest for time travel
    eng.apply_delta(inserts=spark.createDataFrame([(200,)], ["k"]))
    st.vacuum(keep_last=2)
    assert st.manifest(st.current_version() - 1)
    # vacuuming an empty state is a no-op
    from pyspark_validator.incremental import _IncrementalState

    empty = _IncrementalState(spark, str(tmp_path / "none"))
    assert empty.vacuum() == {"manifests_deleted": 0, "dirs_deleted": 0}
