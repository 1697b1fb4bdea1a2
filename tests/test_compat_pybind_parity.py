"""Pybind-surface parity for the remaining reference method names found by a
mechanical sweep of src/python_bindings/*.def("..."):

* result-object display strings — FD::ToLongString/ToShortString
  (fd.cpp:21-38, space-separated names), UCC::ToString (Vertical names),
  IND::ToLongString (ind.cpp:34-55 table/column form + error suffix),
  DomainPAC::ToShortString/ToLongString (domain_pac.h:27-81);
* UccVerifier.validate_ucc / IndVerifier.validate_ind
  (bind_ucc_verification.cpp:28, bind_ind_verification.cpp:23);
* MDVerifier md_holds / get_input_md / get_highlights_copy
  (bind_md_verification.cpp:54-59);
* ar.algorithms.Apriori get_ars/get_ar_ids/get_itemnames (bind_ar.cpp) with
  ARStrings::ToString's fixed-6-decimals format (ar.h:84-104);
* fd.algorithms.Cords get_correlations/get_fds split (cords.cpp:185-210:
  SFDs register as FDs; only chi-square-correlated non-SFD pairs become
  Correlations; only_sfd skips the correlation check)."""

import csv
import random

import pandas as pd
import pytest

from pyspark_validator import compat

RULES_BOOK = "/root/reference/examples/datasets/rules_book_rows.csv"


def test_result_object_strings():
    fd = compat.FD([0, 1], 2, ["A", "B", "C"])
    assert str(fd) == "[A B] -> C"  # __str__ = ToLongString
    assert fd.to_long_string() == "[A B] -> C"
    assert fd.to_short_string() == "[ 0 1 ] -> 2"

    ucc = compat.UCC([0, 2], ["A", "B", "C"])
    assert str(ucc) == "[0 2]"  # __str__ = indices string
    assert ucc.to_long_string() == "[A C]"

    ind = compat.IND("orders.customer_id", "customers.id", 0.0)
    assert ind.to_long_string() == "(orders, [customer_id]) -> (customers, [id])"
    aind = compat.IND("orders.customer_id", "customers.id", 1 / 3)
    assert aind.to_long_string() == (
        "(orders, [customer_id]) -> (customers, [id])"
        " with error threshold = 0.333333"
    )
    nary = compat.IND("t.a, t.b", "u.x, u.y", 0.0)
    assert nary.to_long_string() == "(t, [a, b]) -> (u, [x, y])"


def test_validate_ucc_and_validate_ind(spark):
    df = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"], "c": [1, 2, 3]})
    v = compat.UccVerifier(spark)
    v.load_data(df)
    v.validate_ucc(compat.UCC([0, 1], ["a", "b", "c"]))
    assert v.ucc_holds() is True
    v.validate_ucc(compat.UCC([0], ["a", "b", "c"]))
    assert v.ucc_holds() is False

    iv = compat.IndVerifier(spark)
    iv.load_data(pd.DataFrame({"k": [1, 2, 9]}), pd.DataFrame({"r": [1, 2, 3]}))
    iv.validate_ind(compat.IND("lhs.k", "rhs.r"))
    assert iv.ind_holds() is False
    assert iv.get_error() == pytest.approx(1 / 3)


def test_md_verifier_pybind_aliases(spark):
    df = pd.DataFrame({"id": [1, 2], "a": ["abc", "abd"], "b": ["u", "u"]})
    v = compat.MdVerifier(spark)
    v.load_data(df)
    lhs = [("levenshtein", "a", None, 0.6)]
    v.execute(lhs, ("levenshtein", "b", None, 0.9), left_id="id")
    assert v.md_holds() == v.get_result()
    inp = v.get_input_md()
    assert inp["rhs"][1] == pytest.approx(0.9)  # input boundary, not suggested
    copy = v.get_highlights_copy()
    assert copy == v.get_highlights()
    if copy:
        copy[0]["mutated"] = True
        assert "mutated" not in v.get_highlights()[0]


def test_domain_pac_result_object(spark):
    v = compat.PacVerifier(spark)
    v.load_data(pd.DataFrame({"t": [79.0, 85.0, 90.0, 96.0, 104.0]}))
    v.execute("t", domain=(85.0, 95.0), exact=True)
    pac = v.get_pac()
    assert pac.get_epsilon() == pytest.approx(pac["epsilon"])
    assert pac.get_column_names() == ["t"]
    assert pac.get_domain_name() == "[85, 95]"
    eps, delta = pac["epsilon"], pac["delta"]
    assert pac.to_short_string() == f"Pr([t] ∈ [85, 95]±{eps:g}) ≥ {delta:g}"
    assert str(pac) == (
        f"Domain PAC Pr(x ∈ [85, 95]±{eps:g}) ≥ {delta:g} on columns [t]"
    )


def test_apriori_facade_rules_book(spark):
    rows = list(csv.reader(open(RULES_BOOK)))
    ap = compat.Apriori(spark)
    ap.load_data(pd.DataFrame(rows), input_format="tabular")
    ap.execute(minconf=1.0)
    ars = ap.get_ars()
    assert len(ars) == 24  # the mining_ar snapshot's published count
    names = ap.get_itemnames()
    # first-occurrence order over the tabular rows
    assert names == ["Bread", "Butter", "Milk", "Eggs", "Yogurt", "Cheese"]
    by_str = {str(a) for a in ars}
    assert "conf: 1.000000\tsup: 0.400000\t{Bread} -> {Milk}" in by_str
    # get_ar_ids indexes into get_itemnames
    ids = ap.get_ar_ids()
    ix = {n: i for i, n in enumerate(names)}
    for a, i in zip(ars, ids):
        assert [ix[n] for n in a.left] == i.left
        assert [ix[n] for n in a.right] == i.right
        assert a.support == i.support and a.confidence == i.confidence


def test_cords_facade_registration_split(spark):
    random.seed(7)
    n = 400
    dept = [random.choice("abcd") for _ in range(n)]
    floor = [{"a": "1", "b": "1", "c": "2", "d": "2"}[d] for d in dept]
    noise = [random.choice("xyz") for _ in range(n)]
    df = pd.DataFrame({"dept": dept, "floor": floor, "noise": noise})

    co = compat.Cords(spark)
    co.load_data(df)
    co.execute()
    # dept -> floor holds as a soft FD: registered as an FD, NOT a Correlation
    assert [str(f) for f in co.get_fds()] == ["[dept] -> floor"]
    assert all(
        (c.GetLhsName(), c.GetRhsName()) != ("dept", "floor")
        for c in co.get_correlations()
    )
    co.execute(only_sfd=True)
    assert co.get_correlations() == []
    assert [str(f) for f in co.get_fds()] == ["[dept] -> floor"]
