"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf_dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet
tables, and compares: row count, column names, TYPE CLASSES, and
values (rows sorted by all columns, columns sorted by name —
order-insensitive like the driver's value-hash). Exact equality for
non-floats; floats must agree to 1e-9 relative (queries are expected
to round/decimal-discipline themselves so even exact equality
normally holds).

Type classes are compared STRICTLY before values: the driver hashes
typed Arrow cells, so a DuckDB HUGEINT (Arrow decimal128) vs a Spark
BIGINT fails the driver even when every value is numerically equal.
Round 2 shipped exactly that bug (`partition_lineage`: an un-cast
``sum(case …)``) for two rounds because this gate coerced both sides
through ``astype(float)``. The oracle result is now fetched as Arrow
(``.arrow()``, not ``.df()``) so DuckDB's decimals survive to the
comparison instead of being silently narrowed by pandas.

``--strict`` upgrades the gate to DRIVER PARITY — the three failure
modes round 4 proved the tolerant compare cannot see:

* float columns compare by BIT PATTERN (``-0.0`` != ``+0.0``; Spark's
  ``ROUND`` goes through ``java.math.BigDecimal`` which has no negative
  zero, DuckDB/libm preserves it — numerically equal, red under the
  driver's typed value hash; r4 ``calendar_features``),
* array/struct/map output columns FAIL outright (the driver's
  canonicalizer sorts cell values and dies on ``numpy.ndarray`` —
  r4 ``random_projection`` / ``snapshot_diff``),
* decimal output columns wider than 18 digits FAIL outright (the
  driver's oracle path narrows wide decimals through pandas and
  diverges from Spark's Decimal objects — r4 ``table_fingerprint``,
  r1/r2 ``partition_lineage``).

CALIBRATION — encoded from measured driver behavior: ``pagerank``
carries ~95/1600 cross-engine double diffs of ~4e-12
(double->decimal(27,12) cast rounding at half-quantum boundaries) and
its r4 driver row was hash-GREEN, while the same driver redded
``calendar_features`` on ``-0.0`` vs ``+0.0``. So the driver's value
hash tolerates ~1e-9 RELATIVE float rounding but distinguishes zero
signs. Strict's bit compare therefore splits mismatches: a zero-sign
flip or any diff >= 1e-9 relative FAILS; a same-sign bit diff under
1e-9 relative prints as ``warn`` (advisory — the driver-green class:
cross-engine last-ulp rounding at magnitudes where the rounding
quantum falls below one double ulp, e.g. ``burstiness`` mean gaps at
~4e10 µs, ``ols2_fit`` intercepts at 9dp) and does NOT fail the gate.
Fix warns if cheap (tighter decimal discipline); they are not
predicted driver reds.

``--shapes`` runs ONLY the registration-shape lint (array/struct/map
and wide-decimal output rejection) over the registry: Spark plan
analysis plus a DuckDB bind per gate, no values fetched — fast enough
to sweep all gates before every window freeze. The same sweep is
enforced by ``tests/test_gate_shapes.py``, so ``pytest`` itself blocks
the round-4 red classes at registration time.

Usage: python tools/selfcheck.py [--strict|--shapes] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from feat_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# driver-parity strictness (set by --strict in main())
STRICT = False
# all NaN bit patterns hash alike; only the NaN-vs-number split matters
_CANON_NAN = np.float64("nan").view(np.uint64)
# 18 digits is the widest decimal that survives the driver's pandas
# narrowing losslessly (int64-representable digits); wider decimals
# (HUGEINT sums, decimal(38,0) checksums) render differently between
# the driver's Spark fetch and its DuckDB fetch
_MAX_SAFE_DECIMAL_PRECISION = 18


def strict_schema_problems(
    name: str, spark_schema, oracle_schema: pa.Schema | None
) -> list[str]:
    """Registration-shape lint: the output-column shapes the driver
    harness cannot canonicalize, independent of values."""
    from pyspark.sql import types as T

    problems = []
    for f in spark_schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)):
            problems.append(
                f"strict: spark col {f.name} is {f.dataType.simpleString()} — "
                "driver _canon crashes on array/struct/map output columns; "
                "project scalars (concat_ws/to_json or posexplode)"
            )
        if (
            isinstance(f.dataType, T.DecimalType)
            and f.dataType.precision > _MAX_SAFE_DECIMAL_PRECISION
        ):
            problems.append(
                f"strict: spark col {f.name} is {f.dataType.simpleString()} — "
                "driver narrows wide decimals through pandas; emit BIGINT "
                "halves or a string"
            )
    if oracle_schema is not None:
        for f in oracle_schema:
            t = f.type
            if (
                pa.types.is_list(t)
                or pa.types.is_large_list(t)
                or pa.types.is_fixed_size_list(t)
                or pa.types.is_struct(t)
                or pa.types.is_map(t)
            ):
                problems.append(
                    f"strict: oracle col {f.name} is {t} — driver _canon "
                    "crashes on array/struct/map output columns"
                )
            if pa.types.is_decimal(t) and t.precision > _MAX_SAFE_DECIMAL_PRECISION:
                problems.append(
                    f"strict: oracle col {f.name} is {t} — driver narrows "
                    "wide decimals through pandas"
                )
    return problems


def _arrow_class(t: pa.DataType) -> str:
    """Collapse an Arrow type to the class the driver's value-hash
    distinguishes: int vs float vs decimal vs string vs … — Decimal(123)
    and 123 hash differently, so classes must match exactly."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{_arrow_class(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _type_classes(tbl: pa.Table) -> dict[str, str]:
    return {f.name: _arrow_class(f.type) for f in tbl.schema}


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _spark_class(dt) -> str:
    """Spark-type twin of :func:`_arrow_class` (same class vocabulary)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_class(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    return str(dt)


def compare(
    name: str,
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    spark_classes: dict[str, str] | None = None,
    oracle_classes: dict[str, str] | None = None,
) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    # Driver-strict: type classes must match BEFORE any value coercion —
    # the float fallback below must never see an int-vs-decimal mismatch.
    if spark_classes and oracle_classes:
        for c in sc:
            s_cls, o_cls = spark_classes.get(c), oracle_classes.get(c)
            if s_cls != o_cls:
                problems.append(f"type col {c}: spark={s_cls} oracle={o_cls}")
        if problems:
            return problems
    if problems:
        return problems
    s, o = _norm(spark_pdf), _norm(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            if STRICT:
                # the driver hashes typed cells: -0.0 and +0.0 are
                # DIFFERENT hashes even though == says equal
                ab = a.view(np.uint64).copy()
                bb = b.view(np.uint64).copy()
                ab[np.isnan(a)] = _CANON_NAN
                bb[np.isnan(b)] = _CANON_NAN
                ok = ab == bb
                # Measured driver calibration (r4 evidence): the value
                # hash tolerates sub-1e-9 RELATIVE float rounding
                # (pagerank was hash-GREEN with 95 diffs at ~4e-12) but
                # distinguishes zero signs (calendar_features was RED on
                # -0.0 vs +0.0). Bit diffs that keep the sign bit and
                # stay under 1e-9 relative are therefore ADVISORY — they
                # print but do not fail the gate. A zero-sign flip has
                # relative diff 0/0, so the signbit test must run first.
                bad = ~ok
                if bad.any():
                    sign_flip = np.signbit(a) != np.signbit(b)
                    close = np.isclose(a, b, rtol=1e-9, atol=0.0, equal_nan=True)
                    hard = bad & (sign_flip | ~close)
                    soft = bad & ~hard
                    if soft.any():
                        i = int(np.argmax(soft))
                        problems.append(
                            f"advisory float col {c}: {int(soft.sum())} sub-1e-9 "
                            f"bit diffs (driver-green class), e.g. row {i}: "
                            f"{a[i]!r} (bits {a[i].view(np.uint64)}) vs {b[i]!r}"
                        )
                    ok = ~hard
            else:
                ok = np.isclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                problems.append(
                    f"float col {c}: {int((~ok).sum())} diffs, e.g. row {i}: "
                    f"{a[i]!r} (bits {a[i].view(np.uint64) if STRICT else ''}) vs {b[i]!r}"
                )
        else:
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs, e.g. row {i}: {sv[i]!r} vs {ov[i]!r}"
                )
    return problems


def _duck_shape_problems(name: str, columns, types) -> list[str]:
    """Oracle-side twin of :func:`strict_schema_problems` that needs
    only the BOUND relation (``con.sql(sql).types`` — DuckDB binds and
    plans without executing), so the whole registry can be shape-linted
    in seconds. Rendered type strings are the stable surface:
    lists render as ``BIGINT[]``, structs/maps/unions by keyword,
    decimals as ``DECIMAL(p,s)``."""
    problems = []
    for col, t in zip(columns, types):
        s = str(t).upper()
        if "[]" in s or s.startswith(("STRUCT(", "MAP(", "UNION(")):
            problems.append(
                f"strict: oracle col {col} is {s} — driver _canon crashes "
                "on array/struct/map output columns"
            )
        elif s.startswith("DECIMAL("):
            prec = int(s.split("(")[1].split(",")[0])
            if prec > _MAX_SAFE_DECIMAL_PRECISION:
                problems.append(
                    f"strict: oracle col {col} is {s} — driver narrows "
                    "wide decimals through pandas"
                )
    return problems


def shape_sweep(spark, con, sf_dir: str, names=None) -> dict[str, list[str]]:
    """Registration-time lint over the gate registry: build each
    gate's DataFrame (plan analysis only — values are never fetched)
    and BIND its oracle, then reject the output shapes the driver's
    harness cannot canonicalize (array/struct/map columns, decimals
    wider than 18 digits). This is the check that would have caught
    all three of round 4's non-float red classes before the window
    froze. Returns {gate: [problem, ...]} for offending gates only."""
    qs, oracles = E.queries(), E.oracle_sql()
    out: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if names is not None and name not in names:
            continue
        try:
            spark_schema = fn(spark, sf_dir).schema
        except Exception as exc:  # noqa: BLE001
            out[name] = [f"spark raised {type(exc).__name__}: {exc}"]
            continue
        problems = strict_schema_problems(name, spark_schema, None)
        if name in oracles:
            try:
                rel = con.sql(oracles[name])
                problems += _duck_shape_problems(name, rel.columns, rel.types)
            except Exception as exc:  # noqa: BLE001
                problems.append(f"oracle bind raised {exc}")
        if problems:
            out[name] = problems
    return out


def main() -> int:
    global STRICT
    argv = [a for a in sys.argv[1:] if a not in ("--strict", "--shapes")]
    STRICT = "--strict" in sys.argv[1:]
    shapes_only = "--shapes" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")

    if shapes_only:
        bad = shape_sweep(spark, con, sf_dir, names=only or None)
        for name, problems in bad.items():
            print(f"FAIL  {name}: " + "; ".join(problems))
        print(f"\n{len(bad)} failures" + (f": {sorted(bad)}" if bad else ""))
        return 1 if bad else 0

    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir)
            spark_classes = {f.name: _spark_class(f.dataType) for f in spark_df.schema.fields}
            spark_pdf = spark_df.toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            if STRICT:
                shape_problems = strict_schema_problems(name, spark_df.schema, None)
                if shape_problems:
                    failed.append(name)
                    print(f"FAIL  {name}: " + "; ".join(shape_problems))
                    continue
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            # .arrow(), not .df(): pandas narrows DuckDB HUGEINT/decimal to
            # float64, which is exactly the masking this gate must not do.
            oracle_tbl = con.sql(oracles[name]).arrow()
            oracle_classes = _type_classes(oracle_tbl)
            oracle_pdf = oracle_tbl.to_pandas()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: oracle raised {exc}")
            continue
        if STRICT:
            shape_problems = strict_schema_problems(
                name, spark_df.schema, oracle_tbl.schema
            )
            if shape_problems:
                failed.append(name)
                print(f"FAIL  {name}: " + "; ".join(shape_problems))
                continue
        problems = compare(name, spark_pdf, oracle_pdf, spark_classes, oracle_classes)
        warns = [p for p in problems if p.startswith("advisory ")]
        problems = [p for p in problems if not p.startswith("advisory ")]
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems + warns))
        elif warns:
            print(
                f"warn  {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s] — "
                + "; ".join(warns)
            )
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
