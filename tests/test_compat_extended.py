"""Reference-API facade tests for the round-2 verifier families: every
remaining pybind verifier class (src/python_bindings/{mfd,nd,od,cfd,cind,pac,
ar,dc,dd,pfd,afd_metric}) has a compat analog with the reference's getter
names. Small closed-form inputs so every expected value is hand-checkable."""

import pandas as pd
import pytest

from pyspark_validator.compat import (
    AfdMetricCalculator,
    ArVerifier,
    CfdVerifier,
    CindVerifier,
    DcVerifier,
    DdVerifier,
    MetricVerifier,
    NdVerifier,
    OdVerifier,
    PacVerifier,
    PfdVerifier,
)

BERNOULLI = pd.DataFrame(
    {
        "a": [1, 0, 0, 0, 0, 0],
        "b": [1, 0, 0, 1, 1, 0],
        "c": [1, 0, 1, 0, 1, 0],
        "d": [1, 1, 0, 1, 0, 0],
        "e": [1, 1, 1, 1, 0, 1],
        "f": [1, 1, 1, 0, 1, 1],
    }
)


def test_metric_verifier(spark):
    v = MetricVerifier(spark)
    v.load_data(pd.DataFrame({"x": ["a", "a", "b"], "y": [1.0, 5.0, 2.0]}))
    v.execute(["x"], ["y"], metric="euclidean", parameter=3.0)
    assert not v.mfd_holds()
    hl = v.get_highlights()
    assert len(hl) == 1 and hl[0]["max_distance"] == pytest.approx(4.0)
    v.execute(["x"], ["y"], metric="euclidean", parameter=4.0)
    assert v.mfd_holds()


def test_nd_verifier(spark):
    # c0 -> c1 with 4 distinct c1 values under the single c0 value
    df = pd.DataFrame(
        {"c0": ["1"] * 12, "c1": list("aaabbbcccddd")}
    )
    v = NdVerifier(spark)
    v.load_data(df)
    v.execute(["c0"], ["c1"], weight=4)
    assert v.nd_holds and v.real_weight == 4 and v.global_min_weight == 4
    assert v.highlights == []
    v.execute(["c0"], ["c1"], weight=3)
    assert not v.nd_holds
    (h,) = v.highlights
    assert h["lhs_value"] == "1"
    assert h["occurrences_number"] == 12
    assert h["distinct_rhs_values_number"] == 4
    assert sorted(h["most_frequent_rhs_values"]) == ["a", "b", "c", "d"]
    assert v.get_lhs_frequencies() == {"1": 12}
    assert v.get_rhs_frequencies()["a"] == 3


def test_od_verifier_reference_positional_parity(spark):
    """test_set_based_verifier.cpp Bernoulli cases: a pandas load gets
    positional row ids, so removal sets match the reference's 0-based indices
    verbatim."""
    v = OdVerifier(spark)
    v.load_data(BERNOULLI)
    # {A}: D<= ~ E<= , {A}: [] -> F  => {3}
    v.execute(oc_context=["a"], oc_left="d", oc_right="e", ofd_context=["a"], ofd_right="f")
    assert v.get_removal_set() == [3]
    assert not v.holds()
    assert v.holds(error=0.2)
    assert v.get_error() == pytest.approx(1 / 6)
    # {A}: D>= ~ E<= , {A}: [] -> E  => {4}
    v.execute(
        oc_context=["a"], oc_left="d", oc_right="e",
        oc_left_ordering="descending", ofd_context=["a"], ofd_right="e",
    )
    assert v.get_removal_set() == [4]
    # {}: C>= ~ B<= , {D}: [] -> C  => {0, 4, 5}  (empty OC context)
    v.execute(
        oc_context=[], oc_left="c", oc_right="b",
        oc_left_ordering="descending", ofd_context=["d"], ofd_right="c",
    )
    assert v.get_removal_set() == [0, 4, 5]


def test_cfd_verifier(spark):
    # pattern (x='p', y=_) -> z=_ over 4 supported rows, one violating
    df = pd.DataFrame(
        {
            "x": ["p", "p", "p", "p", "q"],
            "y": ["u", "u", "u", "v", "u"],
            "z": ["1", "1", "2", "3", "9"],
        }
    )
    v = CfdVerifier(spark)
    v.load_data(df)
    v.execute(lhs=[("x", "p"), ("y", None)], rhs=("z", None), minsup=3, minconf=0.5)
    assert v.get_real_support() == 4
    # group (p,u): mode count 2 of 3 -> 1 violation; group (p,v): clean
    assert v.get_num_rows_violating_cfd() == 1
    assert v.get_num_clusters_violating_cfd() == 1
    assert v.get_real_confidence() == pytest.approx(1 - 1 / 4)
    assert v.cfd_holds()
    hl = v.get_highlights()
    assert len(hl) == 1 and hl[0]["violations"] == 1


def test_cind_verifier(spark):
    lhs = pd.DataFrame({"k": [1, 1, 2, 3], "cond": ["O", "O", "O", "F"]})
    rhs = pd.DataFrame({"k": [1, 9]})
    v = CindVerifier(spark)
    v.load_data(lhs, rhs)
    v.execute(["k"], ["k"], lhs_condition="cond = 'O'", min_validity=0.5,
              min_completeness=0.5)
    # supporting baskets {1, 2}; included baskets {1} -> validity 1/2,
    # completeness = included_support / included_baskets_total = 1/1
    # (cind_verifier.cpp ExecuteInternal group mode)
    assert v.get_real_validity() == pytest.approx(1 / 2)
    assert v.get_real_completeness() == pytest.approx(1.0)
    assert v.get_supporting_baskets() == 2
    assert v.get_included_supporting_baskets() == 1
    assert v.get_included_baskets_total() == 1
    assert v.holds()  # 0.5 >= 0.5 and 0.75 >= 0.5
    assert v.get_violating_rows_count() == 1
    assert v.get_violating_clusters_count() == 1


def test_pac_verifier(spark):
    df = pd.DataFrame({"v": [float(i) for i in range(10)]})
    v = PacVerifier(spark)
    v.load_data(df)
    v.execute("v", domain=(0.0, 5.0), exact=True)
    pac = v.get_pac()
    assert set(pac) >= {"epsilon", "delta", "column_names"}
    hl = v.get_highlights(eps_1=0.0)
    # values 6..9 lie outside [0,5] by 1..4, sorted by distance desc
    assert [h[0] for h in hl] == [9.0, 8.0, 7.0, 6.0]
    assert v.get_highlights(eps_1=2.0, eps_2=3.0) == [(8.0, 3.0)]


def test_ar_verifier(spark):
    df = pd.DataFrame(
        {
            "tid": [1, 1, 2, 2, 3, 4],
            "item": ["l", "r", "l", "r", "l", "x"],
        }
    )
    v = ArVerifier(spark)
    v.load_data(df)
    v.execute(left=["l"], right=["r"], minsup=0.5, minconf=0.5)
    assert v.get_real_support() == pytest.approx(2 / 4)
    assert v.get_real_confidence() == pytest.approx(2 / 3)
    assert v.get_num_transactions_satisfying_ar() == 2
    assert v.get_num_transactions_violating_ar() == 1  # tid 3: left, no right
    assert v.ar_holds()
    assert v.get_violating_transaction_ids() == [3]
    assert v.get_num_clusters_violating_ar() >= 1


def test_dc_verifier(spark):
    # DC: no two rows share k with s.v > t.w (planted violation rows 1,2)
    df = pd.DataFrame(
        {"rid": [1, 2, 3], "k": [7, 7, 8], "v": [10.0, 1.0, 1.0], "w": [5.0, 5.0, 5.0]}
    )
    v = DcVerifier(spark)
    v.load_data(df)
    v.execute(
        [("s.k", "==", "t.k"), ("s.v", ">", "t.w")], row_ref="rid"
    )
    assert not v.dc_holds()
    assert v.get_num_violating_pairs() == 1
    assert v.get_violations() == [(1, 2)]


def test_dd_verifier(spark):
    df = pd.DataFrame(
        {"rid": [1, 2, 3], "x": [1.0, 1.5, 9.0], "y": [10.0, 30.0, 11.0]}
    )
    v = DdVerifier(spark)
    v.load_data(df)
    # lhs pair (rows 1,2: |dx|=0.5 in [0,1]) must have |dy| <= 5 -> violated (20)
    v.execute(lhs={"x": (0.0, 1.0)}, rhs={"y": (0.0, 5.0)}, row_ref="rid")
    assert not v.dd_holds()
    assert v.get_num_error_pairs() == 1
    assert v.get_error() == pytest.approx(1.0)
    (h,) = v.get_highlights()
    assert (h["rid_a"], h["rid_b"]) == (1, 2)


def test_pfd_verifier(spark):
    df = pd.DataFrame({"x": ["a", "a", "a", "b"], "y": ["1", "1", "2", "1"]})
    v = PfdVerifier(spark)
    v.load_data(df)
    v.execute(["x"], ["y"], error_measure="per_tuple")
    assert v.get_error() == pytest.approx(1 - 3 / 4)
    assert v.get_num_violating_clusters() == 1
    assert v.get_num_violating_rows() == 1
    assert len(v.get_violating_clusters()) == 1
    v.execute(["x"], ["y"], error_measure="per_value")
    assert v.get_error() == pytest.approx(1 - (2 / 3 + 1) / 2)


def test_afd_metric_calculator(spark):
    df = pd.DataFrame({"x": ["a", "a", "a", "b"], "y": ["1", "1", "2", "1"]})
    v = AfdMetricCalculator(spark)
    v.load_data(df)
    v.execute(["x"], ["y"], metric="g2")
    assert v.get_result() == pytest.approx(3 / 4)  # rows in conflicted clusters / n
    for m in ("tau", "mu_plus", "fi"):
        v.execute(["x"], ["y"], metric=m)
        assert 0.0 <= v.get_result() <= 1.0
    with pytest.raises(ValueError):
        v.execute(["x"], ["y"], metric="nope")


def test_dynamic_fd_verifier(spark, tmp_path):
    """dynamic_fd_verification facade over the golden case
    (test_dynamic_fd_verifier.cpp: lhs {0..4} -> rhs {5}, insert batch =>
    1 error cluster, 2 error rows, error 1/105)."""
    from pyspark_validator.compat import DynamicFdVerifier

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
    INSERT = [
        ("1", "5", "5", "mnop", "10", "10"),
        ("1", "5", "5", "mnop", "10", "11"),
        ("1", "5", "666", "hjkl", "666", "11"),
    ]
    cols = [f"c{i}" for i in range(6)]
    v = DynamicFdVerifier(spark, state_path=str(tmp_path / "state"))
    v.load_data(pd.DataFrame(INIT, columns=cols), lhs_indices=[0, 1, 2, 3, 4],
                rhs_indices=[5])
    v.execute()  # no delta: verdict over the initial state
    # every repeated LHS cluster in INIT carries a constant rhs -> holds
    assert v.fd_holds() and v.get_num_error_clusters() == 0
    v2 = DynamicFdVerifier(spark, state_path=str(tmp_path / "state2"))
    v2.load_data(pd.DataFrame(INIT, columns=cols), lhs_indices=[0, 1, 2, 3, 4],
                 rhs_indices=[5])
    v2.execute(insert=INSERT)
    assert not v2.fd_holds()
    assert v2.get_num_error_clusters() == 1
    assert v2.get_num_error_rows() == 2
    assert v2.get_error() == pytest.approx(2 / (15 * 14))
    (h,) = v2.get_highlights()
    assert h["lhs_values"] == ["1", "5", "5", "mnop", "10"]
    assert h["num_distinct_rhs_values"] == 2


# ---------------------------------------------------------------------------
# Mining facades: Tane / Pyro / HyUCC / Spider / Mind (bind_fd.cpp:75-82,
# bind_ucc.cpp:66-70, bind_ind.cpp:139-146)
# ---------------------------------------------------------------------------
def test_tane_exact_and_afd(spark):
    from pyspark_validator.compat import Tane

    df = pd.DataFrame(
        {
            "k1": [1, 1, 2, 2],
            "k2": [1, 2, 1, 2],
            "c": [10, 10, 20, 20],
            "v": [5, 6, 7, 5],
        }
    )
    t = Tane(spark)
    t.load_data(df)
    t.execute(error=0.0)
    fds = t.get_fds()
    names = {str(f) for f in fds}
    assert "[k1] -> c" in names and "[c] -> k1" in names
    assert "[k1 k2] -> v" in names  # FD::ToLongString: space-separated names
    # index getters (bind_fd.cpp:41-49)
    f = next(x for x in fds if str(x) == "[k1] -> c")
    assert f.lhs_indices == [0] and f.rhs_index == 2
    assert f.to_name_tuple() == (["k1"], "c")
    # AFD mode under a generous budget admits level-1 only (minimality)
    t.execute(error=0.5)
    afd_names = {str(f) for f in t.get_fds()}
    assert all("[" in s for s in afd_names)


def test_hyucc_and_spider_mind(spark):
    from pyspark_validator.compat import HyUCC, Mind, Spider

    df = pd.DataFrame(
        {"k": [1, 2, 3, 4], "g": ["a", "a", "b", "b"], "h": ["x", "y", "x", "y"]}
    )
    u = HyUCC(spark)
    u.load_data(df)
    u.execute()
    uccs = u.get_uccs()
    assert [x.indices for x in uccs] == [[0], [1, 2]]
    assert uccs[0].to_short_string() == "[0]"

    a = pd.DataFrame({"x": [1, 2, 3, 4]})
    b = pd.DataFrame({"y": [1, 2, 3]})
    s = Spider(spark)
    s.load_data({"a": a, "b": b})
    s.execute()
    inds = s.get_inds()
    assert [(i.get_lhs(), i.get_rhs()) for i in inds] == [("b.y", "a.x")]
    assert inds[0].get_error() == 0.0

    m = Mind(spark)
    m.load_data({"a": a, "b": b})
    m.execute(error=0.3)
    got = {(i.get_lhs(), i.get_rhs(), i.get_error()) for i in m.get_inds()}
    assert ("a.x", "b.y", 0.25) in got and ("b.y", "a.x", 0.0) in got


def test_miner_alias_facades(spark):
    """The remaining pybind miner names (bind_fd.cpp:78-82, bind_ucc.cpp:67)
    are facades over the same canonical minimal sets: every FD miner equals
    Tane's output, every UCC miner equals HyUCC's."""
    from pyspark_validator import compat

    df = pd.DataFrame(
        {
            "k1": [1, 1, 2, 2],
            "k2": [1, 2, 1, 2],
            "c": [10, 10, 20, 20],
            "v": [5, 6, 7, 5],
        }
    )
    t = compat.Tane(spark)
    t.load_data(df)
    t.execute(error=0.0)
    want = {str(f) for f in t.get_fds()}
    for name in ("HyFD", "DFD", "FDep", "FastFDs", "Depminer", "FdMine",
                 "FUN", "Aid", "EulerFD", "PFDTane"):
        cls = getattr(compat, name)
        assert issubclass(cls, compat._Verifier)
        if name == "PFDTane":
            continue  # PFD measure surface covered by its golden suite
        a = cls(spark)
        a.load_data(df)
        a.execute(error=0.0)
        assert {str(f) for f in a.get_fds()} == want, name

    u = compat.HyUCC(spark)
    u.load_data(df)
    u.execute()
    want_u = [x.indices for x in u.get_uccs()]
    for name in ("HPIValid", "PyroUCC"):
        a = getattr(compat, name)(spark)
        a.load_data(df)
        a.execute()
        assert [x.indices for x in a.get_uccs()] == want_u, name


def test_data_stats_pybind_name_completion(spark):
    """The last 13 bind_statistics.cpp names: get_num_nulls,
    get_{leading,trailing}_whitespace_count, get_special_chars_count,
    get_number_of_columns, get_null_columns, get_zero_percent,
    get_true_count/get_false_count, is_categorical, get_quantile,
    get_monotonicity, show_sample -- reference semantics hand-checked
    (data_stats.cpp:221-373,1202-1346)."""
    from pyspark_validator.compat import DataStats

    pdf = pd.DataFrame(
        {
            "a": [3, 1, 2, 0, None, 0],
            "s": ["  x", "hello!", None, "z ", "", "abc"],
            "b": [True, False, True, None, True, False],
            "mono": [1, 2, 3, 4, 5, 6],
            "allnull": pd.array([None] * 6, dtype="float64"),
        }
    )
    ds = DataStats(spark)
    ds.load_data(pdf)
    ds.execute()

    assert ds.get_number_of_columns() == 5
    assert ds.get_null_columns() == ["allnull"]
    assert ds.get_num_nulls("a") == 1
    assert ds.get_leading_whitespace_count("s") == 1
    assert ds.get_trailing_whitespace_count("s") == 1
    # 'hello!' is the only row containing the kSpecialChars set
    assert ds.get_special_chars_count("s") == 1
    # zeros=2, NumberOfValues(5 non-null) - nulls(1) = 4 (reference's literal
    # double-subtract formula, data_stats.cpp:332-336)
    assert ds.get_zero_percent("a") == pytest.approx(0.5)
    assert ds.get_true_count("b") == 3
    assert ds.get_false_count("b") == 2
    assert ds.is_categorical("a", 50) and not ds.is_categorical("a", 2)
    # sorted non-null a = [0,0,1,2,3]; k = floor(5*0.5) = 2 -> 1
    assert ds.get_quantile(0.5, "a") == pytest.approx(1.0)
    assert ds.get_quantile(0.0, "a") == pytest.approx(0.0)
    assert ds.get_quantile(1.0, "a") == pytest.approx(3.0)  # clamp to last
    assert ds.get_monotonicity("mono") == "ascending"
    assert ds.get_monotonicity("a") == "none"
    # constant + descending via fresh columns
    ds2 = DataStats(spark)
    ds2.load_data(pd.DataFrame({"c": [7, 7, None, 7], "d": [3, 2, 1, 0]}))
    ds2.execute()
    assert ds2.get_monotonicity("c") == "equal"
    assert ds2.get_monotonicity("d") == "descending"
    # 1-based inclusive window, stringified, file order
    assert ds.show_sample(2, 3, 1, 2) == [["1.0", "hello!"], ["2.0", ""]]
    # positional indices address DATA columns (not the attached __row_index)
    assert ds.get_num_nulls(1) == 1


def test_order_facade(spark):
    """compat.Order analog of bind_od.cpp:131-141: get_list_ods flattens
    GetValidODs into ListOD objects; the b->a direction is valid (a refines
    b order-compatibly) while a->b is a merge."""
    from pyspark_validator.compat import ListOD, Order

    pdf = pd.DataFrame({"a": [1, 1, 2, 3], "b": [10, 11, 20, 30]})
    algo = Order(spark)
    algo.load_data(pdf)
    algo.execute()
    ods = algo.get_list_ods()
    assert ListOD([0], [1]) in ods
    assert ListOD([1], [0]) not in ods
