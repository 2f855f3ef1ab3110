"""Semi-structured (JSON-string) column extraction.

Lives OUTSIDE operators/extract.py deliberately: extract.py is part of
the flagship benchmark closure (tools/bench_scaling.py hashes it to
gate published scaling rows), and additive operators must not churn
that hash. Semantically this is extract.py's sibling — the on-ramp
where JSON text becomes the typed nested payloads the schema'd readers
walk (reference scope: /root/reference/src/feat.erl read/2 consumes
already-decoded terms; this is the decode step before it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def parse_json_column(
    df: DataFrame,
    json_col: str,
    schema: "str | T.StructType",
    corrupt_col: str = "is_corrupt",
    drop_source: bool = False,
) -> DataFrame:
    """Typed extraction from a JSON-string column with corrupt-row
    accounting — the semi-structured on-ramp next to the schema'd
    payload readers above (feat.erl's read/2 walks an already-decoded
    nested term; production event streams carry the same payloads as
    JSON text, and THIS is where they become columns).

    ``from_json`` runs JVM-side (Jackson inside whole-stage codegen —
    never a Python UDF). PERMISSIVE mode fills a corrupt row's fields
    with NULLs — indistinguishable from valid JSON that simply lacks
    the keys — so the flag rides Spark's own corrupt-record channel: a
    ``columnNameOfCorruptRecord`` field is appended to the schema and
    carries the raw text exactly when parsing failed. A missing field
    stays a legitimate NULL column (the reference's undefined-leaf
    semantics); a corrupt row is a data incident the pipeline can
    count and quarantine (``filter(F.col(corrupt_col))`` is the
    quarantine scan).

    The parsed struct is flattened into top-level columns (callers
    get ``k``, not ``parsed.k``). One projection, no shuffle.
    """
    if isinstance(schema, str):
        aug = schema + ", __bad string"
    else:
        aug = T.StructType(
            list(schema.fields) + [T.StructField("__bad", T.StringType())]
        )
    parsed = F.from_json(
        F.col(json_col), aug, {"columnNameOfCorruptRecord": "__bad"}
    )
    out = df.withColumn("__parsed", parsed).withColumn(
        corrupt_col, F.col("__parsed.__bad").isNotNull()
    )
    field_names = [
        c for c in out.select("__parsed.*").columns if c != "__bad"
    ]
    for name in field_names:
        out = out.withColumn(name, F.col(f"__parsed.{name}"))
    out = out.drop("__parsed")
    if drop_source:
        out = out.drop(json_col)
    return out


def cast_audit(
    df: DataFrame,
    casts: "list[tuple[str, str]]",
) -> DataFrame:
    """Type-coercion audit — for each declared ``(column, target
    type)``, how many values would fail the cast: the dry-run a
    schema-migration or ingest-normalization step runs BEFORE
    committing to a typed write (ANSI mode — this engine's default —
    makes a bad cast a job-killing exception; this operator finds
    them all in one pass instead of one crash at a time).

    All checks fold into a SINGLE scan aggregate (``try_cast`` is a
    codegen expression, one conditional sum per declared cast — the
    ``expectation_report`` cost model). NULL inputs are counted
    separately: they cast to NULL legally and must not be reported
    as failures.

    Output: ``(col, target_type, n_rows, n_null_in, n_failed)``.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (col, typ) in enumerate(casts):
        aggs.append(
            F.sum(F.col(col).isNull().cast("long")).alias(f"__nn{i}")
        )
        aggs.append(
            F.sum(
                (
                    F.col(col).isNotNull()
                    & F.col(col).try_cast(typ).isNull()
                ).cast("long")
            ).alias(f"__nf{i}")
        )
    row = df.agg(*aggs)
    outs = []
    for i, (col, typ) in enumerate(casts):
        outs.append(
            row.select(
                F.lit(col).alias("col"),
                F.lit(typ).alias("target_type"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn{i}").alias("n_null_in"),
                F.col(f"__nf{i}").alias("n_failed"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def variant_features(
    json_col,
    fields: "dict[str, tuple[str, str]]",
):
    """Typed extraction through Spark 4's VariantType — parse once
    with ``try_parse_json`` (malformed input becomes NULL, never an
    ANSI abort mid-job), then ``try_variant_get`` each requested
    ``(path, type)``: the open-schema ingestion path for payload
    columns whose shape drifts faster than a struct schema can chase
    (the engine's JSON-string device in :func:`json_features` reparses
    per field; Variant parses ONCE into a binary-encoded value and
    each extraction is a cheap binary probe — the Spark-4-native answer).

    Returns a dict of named Columns: the requested fields plus
    ``is_valid_json`` (did the row parse at all). Pure projection —
    codegen, no shuffle, no UDF.
    """
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    v = F.try_parse_json(c)
    out = {
        name: F.try_variant_get(v, path, dtype)
        for name, (path, dtype) in fields.items()
    }
    out["is_valid_json"] = v.isNotNull()
    return out
