"""Regression tests for the dtype-strict local correctness gate.

Round 2 post-mortem: ``partition_lineage`` failed the driver's exact
value-hash for two rounds because its oracle's bare ``sum(case …)``
returned DuckDB HUGEINT (Arrow decimal128) while Spark emitted BIGINT —
and ``tools/selfcheck.py`` masked the mismatch by coercing both sides
through ``astype(float)``. The local gate must be at least as strict as
the driver: type CLASSES (int vs decimal vs float) compare before any
value coercion. These tests pin that behavior without needing Spark.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from selfcheck import _arrow_class, _spark_class, _type_classes, compare  # noqa: E402


_CON = duckdb.connect()


def _oracle(sql: str) -> pa.Table:
    return _CON.sql(sql).arrow()


def test_uncast_hugeint_sum_is_flagged():
    """The exact round-2 bug: DuckDB sum(int) → HUGEINT vs Spark BIGINT
    must FAIL even though every value is numerically equal."""
    tbl = _oracle("select sum(x) as null_purchase_value from (values (1),(2),(3)) t(x)")
    assert _type_classes(tbl) == {"null_purchase_value": "decimal"}
    spark_pdf = pd.DataFrame({"null_purchase_value": pd.array([6], dtype="int64")})
    problems = compare(
        "partition_lineage_regression", spark_pdf, tbl.to_pandas(),
        spark_classes={"null_purchase_value": "int"},
        oracle_classes=_type_classes(tbl),
    )
    assert problems and "type col null_purchase_value" in problems[0]


def test_cast_bigint_sum_passes():
    """The one-line fix: cast(sum(…) as bigint) restores class parity."""
    tbl = _oracle(
        "select cast(sum(x) as bigint) as null_purchase_value from (values (1),(2),(3)) t(x)"
    )
    assert _type_classes(tbl) == {"null_purchase_value": "int"}
    spark_pdf = pd.DataFrame({"null_purchase_value": pd.array([6], dtype="int64")})
    problems = compare(
        "partition_lineage_fixed", spark_pdf, tbl.to_pandas(),
        spark_classes={"null_purchase_value": "int"},
        oracle_classes=_type_classes(tbl),
    )
    assert problems == []


def test_int_vs_float_class_mismatch_flagged():
    tbl = _oracle("select 1.5::double as v")
    problems = compare(
        "float_vs_int", pd.DataFrame({"v": pd.array([1], dtype="int64")}),
        tbl.to_pandas(),
        spark_classes={"v": "int"}, oracle_classes=_type_classes(tbl),
    )
    assert problems and "type col v" in problems[0]


def test_matching_float_classes_still_use_tolerance():
    tbl = _oracle("select 0.30000000000000004::double as v")
    problems = compare(
        "float_tol", pd.DataFrame({"v": [0.1 + 0.2]}), tbl.to_pandas(),
        spark_classes={"v": "float"}, oracle_classes=_type_classes(tbl),
    )
    assert problems == []


def test_strict_zero_sign_flip_fails():
    """r4 calendar_features class: -0.0 vs +0.0 is a driver red — the
    typed value hash distinguishes zero signs."""
    import selfcheck

    selfcheck.STRICT = True
    try:
        problems = compare(
            "zero_sign", pd.DataFrame({"v": [0.0]}), pd.DataFrame({"v": [-0.0]}),
            spark_classes={"v": "float"}, oracle_classes={"v": "float"},
        )
    finally:
        selfcheck.STRICT = False
    assert problems and "float col v" in problems[0]
    assert not problems[0].startswith("advisory")


def test_strict_sub_1e9_bit_diff_is_advisory():
    """Measured calibration: pagerank was driver hash-GREEN with ~4e-12
    relative diffs, so same-sign bit diffs under 1e-9 relative must be
    advisory (warn), not failures."""
    import numpy as np
    import selfcheck

    a = 0.007523040633
    b = np.nextafter(a, 0.0)  # one ulp apart, same sign, ~1e-16 relative
    selfcheck.STRICT = True
    try:
        problems = compare(
            "ulp_diff", pd.DataFrame({"v": [a]}), pd.DataFrame({"v": [b]}),
            spark_classes={"v": "float"}, oracle_classes={"v": "float"},
        )
    finally:
        selfcheck.STRICT = False
    assert len(problems) == 1 and problems[0].startswith("advisory float col v")


def test_strict_large_float_diff_still_fails():
    import selfcheck

    selfcheck.STRICT = True
    try:
        problems = compare(
            "real_diff", pd.DataFrame({"v": [1.0]}), pd.DataFrame({"v": [1.001]}),
            spark_classes={"v": "float"}, oracle_classes={"v": "float"},
        )
    finally:
        selfcheck.STRICT = False
    assert problems and problems[0].startswith("float col v")


def test_arrow_class_vocabulary_matches_spark_class():
    """Every class the oracle side can emit has a Spark-side twin so
    legitimately-matching schemas never false-positive."""
    from pyspark.sql import types as T

    pairs = [
        (pa.int64(), T.LongType()),
        (pa.int32(), T.IntegerType()),
        (pa.float64(), T.DoubleType()),
        (pa.decimal128(38, 0), T.DecimalType(38, 0)),
        (pa.bool_(), T.BooleanType()),
        (pa.string(), T.StringType()),
        (pa.large_string(), T.StringType()),
        (pa.timestamp("us"), T.TimestampType()),
        (pa.timestamp("us", tz="UTC"), T.TimestampNTZType()),
        (pa.date32(), T.DateType()),
        (pa.binary(), T.BinaryType()),
        (pa.list_(pa.int64()), T.ArrayType(T.LongType())),
        (pa.list_(pa.float64()), T.ArrayType(T.DoubleType())),
    ]
    for arrow_t, spark_t in pairs:
        assert _arrow_class(arrow_t) == _spark_class(spark_t), (arrow_t, spark_t)
