"""FastADC DC-discovery goldens pinned to the reference's test suite
(src/tests/unit/test_dc_structures.cpp + test_dc_structures_correct_results.h)
on its own fixture (test_input_data/TestDC2.csv): the 52-predicate space,
the 20-evidence bitset multiset, and the full 345-DC minimal cover at
evidence_threshold 0.01 -- all byte-exact."""

import os
import re

import pytest

from pyspark_validator.dc_discovery import (
    DCResult,
    _Closure,
    Pred,
    build_evidence,
    build_predicate_space,
    mine_dcs,
)
from pyspark_validator.io import cast_inferred, read_reference_csv

BASE = "/root/reference"
FIXTURE = f"{BASE}/test_input_data/TestDC2.csv"
RESULTS_H = f"{BASE}/src/tests/unit/test_dc_structures_correct_results.h"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(FIXTURE), reason="reference fixtures not available"
)


def _header_block(name: str) -> str:
    hdr = open(RESULTS_H).read()
    block = hdr.split(name + " = {")[1]
    # cut at the first "};" that closes the initializer
    block = block.split("};")[0]
    # concatenate adjacent C++ string literals split across lines
    return re.sub(r'"\s*"', "", block, flags=re.S)


def _string_list(name: str) -> list[str]:
    return re.findall(r'"([^"]+)"', _header_block(name))


@pytest.fixture(scope="module")
def dc2(spark):
    return cast_inferred(read_reference_csv(spark, FIXTURE)).persist()


def test_predicate_space_golden(dc2):
    """kDifferentColumnPredicatesExpected: 52 predicates, exact order --
    the joinable/comparable gating (shared% > 0.3, avg-ratio > 0.1) picks
    exactly the A-C, A-D, C-D crosses and no string crosses."""
    cols = dc2.columns
    space, _ = build_predicate_space(dc2, cols)
    got = [p.to_string(cols) for p in space]
    assert got == _string_list("kDifferentColumnPredicatesExpected")


def test_evidence_set_golden(dc2):
    """kExpectedEvidenceSet: the 20 ordered-pair evidence bitsets, each of
    multiplicity 1, reproduced by the combo-pair cross-join."""
    cols = dc2.columns
    space, _ = build_predicate_space(dc2, cols)
    ev = build_evidence(dc2, cols, space)
    assert sum(c for _, c in ev) == 20 and len(ev) == 20
    got = sorted(
        tuple(i for i in range(len(space)) if (mask >> i) & 1) for mask, _ in ev
    )
    block = _header_block("kExpectedEvidenceSet")
    expected = sorted(
        tuple(int(x) for x in re.findall(r"\d+", grp))
        for grp in re.findall(r"\{([^{}]+)\}", block)
    )
    assert got == expected


def test_denial_constraints_golden(dc2):
    """kExpectedDenialConstraints: the full minimal DC cover at threshold
    0.01, byte-exact against the reference strings."""
    expected = _string_list("kExpectedDenialConstraints")
    dcs = mine_dcs(dc2, evidence_threshold=0.01)
    got = [d.to_string() for d in dcs]
    assert sorted(got) == sorted(expected)
    assert len(got) == len(expected)


def test_closure_contradiction_and_inference():
    """closure.h: == implies >= and <=; != with <= infers <; a predicate
    plus its inverse is a contradiction."""
    eq = Pred("==", 0, 0, 1, 0)
    cl = _Closure({eq})
    assert cl.construct()
    assert Pred(">=", 0, 0, 1, 0) in cl.closure
    assert Pred("<=", 0, 0, 1, 0) in cl.closure
    bad = _Closure({Pred("<", 0, 0, 1, 0), Pred(">=", 0, 0, 1, 0)})
    assert not bad.construct()
    inf = _Closure({Pred("!=", 0, 0, 1, 0), Pred("<=", 0, 0, 1, 0)})
    assert inf.construct()
    assert Pred("<", 0, 0, 1, 0) in inf.closure


def test_threshold_relaxation(dc2):
    """A looser evidence budget can only shrink or keep each DC's
    violation set; the mined covers stay valid: every DC violates at most
    threshold * 20 ordered pairs."""
    cols = dc2.columns
    space, provider = build_predicate_space(dc2, cols)
    ev = build_evidence(dc2, cols, space)
    for thr in (0.01, 0.2):
        budget = 20 - __import__("math").ceil((1 - thr) * 20)
        for dc in mine_dcs(dc2, evidence_threshold=thr):
            idx = {p.to_string(cols): i for i, p in enumerate(space)}
            bits = 0
            for s in dc.predicates:
                bits |= 1 << idx[s]
            violated = sum(c for mask, c in ev if bits & ~mask == 0)
            assert violated <= budget, (dc.to_string(), violated, budget)


def test_fastadc_facade(spark, dc2):
    from pyspark_validator.compat import FastADC

    algo = FastADC(spark)
    algo.load_data(dc2)
    algo.execute(evidence_threshold=0.01)
    dcs = algo.get_dcs()
    assert len(dcs) == 345
    assert all(str(d).startswith("¬{ ") for d in dcs[:3])
