"""FastADC approximate-DC mining pinned to the reference's own example
snapshot (examples/test_examples/snapshots/snap_test_examples_pytest.py,
mining_adc_output): exact DCs on taxes_1, ADCs at evidence_threshold 0.5
on taxes_1 (the g1 relaxation admits single-predicate DCs like
"¬{ t.State == s.State }" at g1 0.25), and exact DCs on taxes_2, where the
planted (Texas, 5000, 0.05) record kills the salary/tax-rate monotonicity
DC.  Complements tests/test_fastadc_reference_golden.py (unit-suite
predicate space / evidence / 345-DC cover) with reference-published
results on a second fixture family."""

import pandas as pd
import pytest

from pyspark_validator.dc_discovery import mine_dcs

DATASETS = "/root/reference/examples/datasets"

GOLDEN = [
    (
        "taxes_1",
        0.0,
        {
            "¬{ t.Salary == s.Salary ∧ t.FedTaxRate == s.FedTaxRate }",
            "¬{ t.State == s.State ∧ t.FedTaxRate == s.FedTaxRate }",
            "¬{ t.State == s.State ∧ t.Salary == s.Salary }",
            "¬{ t.State == s.State ∧ t.Salary >= s.Salary ∧ t.FedTaxRate <= s.FedTaxRate }",
        },
    ),
    (
        "taxes_1",
        0.5,
        {
            "¬{ t.FedTaxRate == s.FedTaxRate }",
            "¬{ t.FedTaxRate > s.FedTaxRate }",
            "¬{ t.Salary == s.Salary }",
            "¬{ t.Salary > s.Salary }",
            "¬{ t.Salary >= s.Salary ∧ t.FedTaxRate != s.FedTaxRate }",
            "¬{ t.Salary >= s.Salary ∧ t.FedTaxRate <= s.FedTaxRate }",
            "¬{ t.Salary >= s.Salary ∧ t.FedTaxRate >= s.FedTaxRate }",
            "¬{ t.State != s.State ∧ t.FedTaxRate >= s.FedTaxRate }",
            "¬{ t.State != s.State ∧ t.Salary >= s.Salary }",
            "¬{ t.State == s.State }",
        },
    ),
    (
        "taxes_2",
        0.0,
        {
            "¬{ t.Salary == s.Salary ∧ t.FedTaxRate == s.FedTaxRate }",
            "¬{ t.State == s.State ∧ t.FedTaxRate == s.FedTaxRate }",
            "¬{ t.State == s.State ∧ t.Salary == s.Salary }",
        },
    ),
]


@pytest.mark.parametrize("name,threshold,want", GOLDEN)
def test_adc_mining_matches_example_snapshot(spark, name, threshold, want):
    pdf = pd.read_csv(f"{DATASETS}/{name}.csv")
    df = spark.createDataFrame(pdf)
    dcs = mine_dcs(df, list(pdf.columns), evidence_threshold=threshold)
    assert {str(d) for d in dcs} == want
