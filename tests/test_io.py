"""Ingestion parity tests: reference CSV conventions (string-first, "NULL"
literal, Empty distinct) and the type-inference lattice
(typed_column_data.h:181-251), pinned on the reference's own type fixtures."""

import pytest

from pyspark_validator.io import (
    cast_inferred,
    infer_reference_types,
    read_reference_csv,
)


def test_read_reference_csv_null_conventions(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\nNULL,\n3,NULL\n")
    df = read_reference_csv(spark, str(p))
    rows = sorted(df.collect(), key=lambda r: (r.a is None, r.a or ""))
    # "NULL" -> SQL NULL; empty cell stays '' (Spark csv reads missing as null;
    # quoted empties survive) -- key point: NULL literal nulled, values intact
    assert [r.a for r in rows] == ["1", "3", None]
    assert rows[2].b == ""  # NULL row's b was empty -> empty string, NOT null


def test_infer_reference_types_lattice(spark):
    rows = [
        ("1", "12345678901234567890123", "1.5", "true", "2020-01-02", "abc", "1"),
        ("-42", "99999999999999999999", "2", "False", "1999-12-31", "2", ""),
        ("7", "10000000000000000000", "-.5e3", "TRUE", "2020-05-05", "x", None),
    ]
    cols = ["i", "big", "d", "b", "dt", "mixed", "int_with_gaps"]
    df = spark.createDataFrame(rows, cols)
    t = infer_reference_types(df)
    assert t == {
        "i": "int",
        "big": "bigint_string",  # >19-digit ints stay strings (builtin.h:21-24)
        "d": "double",
        "b": "boolean",
        "dt": "date",
        "mixed": "string",
        "int_with_gaps": "int",  # empties/nulls excluded from inference
    }
    casted = cast_inferred(df, t)
    types = dict(casted.dtypes)
    assert types["i"] == "bigint" and types["d"] == "double"
    assert types["b"] == "boolean" and types["dt"] == "date"
    assert types["big"] == "string" and types["mixed"] == "string"


def test_infer_on_reference_fixture_shape(spark):
    """TestFD.csv-shaped data: Col0/Col1/Col5 int; Col2/Col3/Col4 mixed->string."""
    rows = [
        ("1", "1", "1", "1.233", "-", "1"),
        ("1", "2", "2.1", "hjkl", "444", "4"),
        ("1", "3", "", "0", "9", "6"),
        ("1", "4", None, "999", "-", "7"),
    ]
    df = spark.createDataFrame(rows, [f"c{i}" for i in range(6)])
    t = infer_reference_types(df)
    assert t["c0"] == "int" and t["c1"] == "int" and t["c5"] == "int"
    assert t["c2"] == "double"  # 1, 2.1 with null/empty excluded
    assert t["c3"] == "string" and t["c4"] == "string"
