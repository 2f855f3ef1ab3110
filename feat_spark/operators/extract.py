"""Feature extraction.

Two surfaces over one schema algebra (``feat_spark.schema``):

* :func:`extract_value` — a driver-side pure-Python interpreter with
  *exact* reference semantics (/root/reference/src/feat.erl:104-234),
  including Erlang-term-order set canonicalization and the full
  traversal-event protocol. It is the correctness oracle for the
  golden-vector tests ported from
  /root/reference/test/feat_tests.erl:142-373, and never touches row
  data at scale.

* :func:`extract` — the engine path: compiles the schema **once on the
  driver** into a tree of ``pyspark.sql.Column`` expressions over a
  nested payload column, then lets Catalyst/Tungsten run it. The
  reference interprets its schema per request (feat.erl:113-126); we
  compile instead — same dispatch, moved from run time to plan time
  (SURVEY.md §3.1). Invalid schemas fail at plan build, before any job
  runs.

Set canonicalization note (SURVEY.md §7 hard part (a)): the reference
orders set elements by Erlang term order of the *raw* element and
emits them value-descending with original indices retained
(feat.erl:128-141). The Spark engine canonicalizes by the *extracted
features* (ascending), because raw open-shape term order does not
exist for a typed struct — both orderings are deterministic and
order-insensitive, which is the property compare relies on.
``extract_value(canonical="features")`` mirrors the engine's rule for
cross-checking Spark output; ``canonical="erlang"`` (default) mirrors
the reference bit-for-bit for the golden vectors.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feat_spark.functions.hashing import spark_leaf_hash, stable_hash
from feat_spark.schema import (
    RESERVED,
    FeatureSchema,
    InvalidSchema,
    InvalidUnionVariants,
    InvalidUnionVariantSchema,
    SetSchema,
    UnionSchema,
    accessor_to_path,
    is_accessor,
    is_nested,
)

# ---------------------------------------------------------------------------
# pure-Python interpreter (oracle; reference-exact)
# ---------------------------------------------------------------------------

EventSink = Callable[[tuple], None]


def _emit(events: EventSink | None, ev: tuple) -> None:
    if events is not None:
        events(ev)


def _term_order_key(v: Any):
    """Total order over JSON-ish terms mirroring Erlang term order for
    the types a request may hold: number < atom(None) < map < list <
    binary(string). Maps order by (size, sorted keys, values in key
    order); lists element-wise (prefix shorter first) — matching
    feat.erl:131's ``lists:keysort`` behaviour on requests."""
    if isinstance(v, bool):  # bools are atoms in Erlang terms
        return (1, (str(v).lower(),))
    if isinstance(v, (int, float)):
        return (0, (float(v),))
    if v is None:
        return (1, ("undefined",))
    if isinstance(v, Mapping):
        keys = sorted(v.keys(), key=lambda k: _term_order_key(k))
        return (2, (len(v), tuple(_term_order_key(k) for k in keys),
                    tuple(_term_order_key(v[k]) for k in keys)))
    if isinstance(v, list):
        return (3, tuple(_term_order_key(x) for x in v))
    if isinstance(v, str):
        return (4, (v.encode("utf-8"),))
    raise TypeError(f"unorderable request term: {type(v)}")


def _features_canon_key(feats: Any):
    """Canonical ordering key over *extracted features*, mirroring how
    Spark compares the engine's feature structs: NULLS FIRST, struct
    fields in sorted-feature-id order, arrays element-wise. Hash leaves
    stay exact int64 (no float coercion — 2^53 collisions would break
    tie-break parity with Spark's long comparison)."""
    if feats is None:
        return (0,)
    if isinstance(feats, Mapping):
        return (1, tuple(_features_canon_key(feats[k]) for k in sorted(feats)))
    if isinstance(feats, list):
        return (1, tuple(_features_canon_key(x) for x in feats))
    return (1, feats)


def _walk(path: list[str], value: Any, events: EventSink | None, then):
    """Accessor path walk in continuation style (feat.erl:215-234):
    ``then("ok"/"missing", v)`` runs *inside* the key-visit bracket, so
    e.g. ``missing_union_variant`` fires between ``request_key_visit``
    and ``request_key_visited`` exactly like the reference
    (feat_tests.erl:324-328). Walking into a non-map emits
    ``invalid_schema_fragment`` and yields undefined WITHOUT invoking
    the continuation (feat.erl:232-234)."""
    if value is None:
        return then("missing", None)
    if not path:
        return then("ok", value)
    key, *rest = path
    if isinstance(value, Mapping):
        if key in value:
            sub = value[key]
            _emit(events, ("request_key_visit", key, sub))
            result = _walk(rest, sub, events, then)
            _emit(events, ("request_key_visited", key, sub))
            return result
        return then("missing", None)
    _emit(events, ("invalid_schema_fragment", path, value))
    return None


def extract_value(
    schema: FeatureSchema,
    request: Any,
    hash_fn: Callable[[Any], int] = stable_hash,
    events: EventSink | None = None,
    canonical: str = "erlang",
    _root: bool = True,
) -> Any:
    """Reference-exact extraction (feat:read/2,3 — feat.erl:104-126)."""
    if _root:
        _emit(events, ("request_visited", request))
    rd = lambda s, r: extract_value(s, r, hash_fn, events, canonical, _root=False)

    if request is None:
        return None
    if isinstance(schema, SetSchema):
        if not isinstance(request, list):
            # reference would crash on non-list; we surface it as invalid
            raise InvalidSchema(schema)
        return _read_set(schema.inner, request, rd, events, canonical)
    if isinstance(schema, UnionSchema):
        return _read_union(schema, request, rd, events)
    if is_nested(schema):
        return _walk(
            accessor_to_path(schema[0]),
            request,
            events,
            lambda st, v: rd(schema[1], v) if st == "ok" else None,
        )
    if is_accessor(schema):
        return _walk(
            accessor_to_path(schema),
            request,
            events,
            lambda st, v: hash_fn(v) if st == "ok" else None,
        )
    if isinstance(schema, Mapping):
        # sorted-fid iteration mirrors Erlang's sorted small-map fold —
        # the golden event sequence depends on it (feat_tests.erl:284-373)
        return {
            fid: rd(entry, request)
            for fid, entry in sorted(schema.items())
            if entry is not RESERVED
        }
    raise InvalidSchema(schema)


def _read_set(inner, elements, rd, events, canonical):
    """Canonical set encoding (feat.erl:128-141): tag with original
    index, order canonically, emit ``[orig_idx, features]`` pairs.

    erlang mode: sort ascending by raw term order with descending-index
    ties (the reference reverses the input before its stable keysort),
    then reverse — value-descending output, exactly the golden order
    0,1,2,4,3,5 of feat_tests.erl:146-200.
    features mode: sort ascending by extracted features (the engine
    rule); events are not meaningful here.
    """
    if canonical == "erlang":
        indexed = list(enumerate(elements))[::-1]
        asc = sorted(indexed, key=lambda p: _term_order_key(p[1]))
        out = []
        for idx, elem in asc:
            _emit(events, ("request_index_visit", idx, elem))
            feats = rd(inner, elem)
            _emit(events, ("request_index_visited", idx, elem))
            out.append([idx, feats])
        return out[::-1]
    pairs = [[idx, rd(inner, elem)] for idx, elem in enumerate(elements)]
    return sorted(pairs, key=lambda p: (_features_canon_key(p[1]), p[0]))


def _read_union(schema: UnionSchema, request, rd, events):
    """feat.erl:143-179 — discriminator read, variant dispatch. The
    variant *lookup* runs inside the walk continuation (so its events
    nest inside the discriminator's key-visit bracket); the variant
    *read* runs after the walk returns (feat.erl:144-166)."""
    if not isinstance(schema.variants, Mapping):
        raise InvalidUnionVariants(schema.variants)

    def lookup(status, variant):
        if status == "missing":
            _emit(events, ("missing_union_variant_value", request, schema))
            return None
        spec = schema.variants.get(variant, _MISSING)
        if spec is _MISSING:
            _emit(events, ("missing_union_variant", variant, request, schema))
            return None
        if not (
            isinstance(spec, tuple)
            and len(spec) == 2
            and isinstance(spec[0], int)
            and isinstance(spec[1], Mapping)
        ):
            raise InvalidUnionVariantSchema(variant, spec)
        return (variant, *spec)

    resolved = _walk(accessor_to_path(schema.accessor), request, events, lookup)
    if resolved is None:
        return None
    variant, feature_id, inner = resolved
    _emit(events, ("request_variant_visit", feature_id, variant, request))
    result = [
        feature_id,
        {f: rd(e, request) for f, e in sorted(inner.items()) if e is not RESERVED},
    ]
    _emit(events, ("request_variant_visited", feature_id, variant, request))
    return result


_MISSING = object()


# ---------------------------------------------------------------------------
# Spark column compiler (engine path)
# ---------------------------------------------------------------------------


def _field_type(dt: T.DataType, path: list[str]) -> T.DataType | None:
    """Resolve the Spark type at a payload path; None = absent field
    (compiles to NULL — feat's missing-path ⇒ undefined)."""
    cur = dt
    for key in path:
        if not isinstance(cur, T.StructType):
            return None
        names = {f.name: f.dataType for f in cur.fields}
        if key not in names:
            return None
        cur = names[key]
    return cur


def _access(col: Column, dt: T.DataType, path: list[str]) -> tuple[Column, T.DataType | None]:
    """Null-propagating struct path access. Absent fields compile to a
    typed NULL literal rather than an analysis error: open-shape
    payloads may simply not carry the key (feat.erl:229-230)."""
    ft = _field_type(dt, path)
    if ft is None:
        return F.lit(None), None
    cur = col
    for key in path:
        cur = cur.getField(key)
    return cur, ft


def compile_schema(
    schema: FeatureSchema,
    payload: Column,
    payload_type: T.DataType,
    leaf_hash=spark_leaf_hash,
) -> Column:
    """Schema → single nested Column expression (driver-side dispatch —
    the plan-time analogue of feat.erl:113-126's per-request dispatch).

    Encoding of features as Spark types:
      map features  → struct<f{id}: ...> (fields in sorted-id order)
      set features  → array<struct<idx:int, f:...>> canonically sorted
      union features→ struct<variant:int, f{vid}: struct...> (one field
                      per distinct variant feature id; only the active
                      variant's field is non-null)
      leaf          → nullable long (xxhash64)
    """
    if is_accessor(schema):
        c, ft = _access(payload, payload_type, accessor_to_path(schema))
        if ft is None:
            return F.lit(None).cast("long")
        return leaf_hash(c)
    if is_nested(schema):
        c, ft = _access(payload, payload_type, accessor_to_path(schema[0]))
        if ft is None:
            return _null_of(schema[1])
        return compile_schema(schema[1], c, ft, leaf_hash)
    if isinstance(schema, SetSchema):
        return _compile_set(schema.inner, payload, payload_type, leaf_hash)
    if isinstance(schema, UnionSchema):
        return _compile_union(schema, payload, payload_type, leaf_hash)
    if isinstance(schema, Mapping):
        return _compile_map(schema, payload, payload_type, leaf_hash)
    raise InvalidSchema(schema)


def _compile_map(
    schema: Mapping, payload: Column, ptype: T.DataType, leaf_hash=spark_leaf_hash
) -> Column:
    fields = [
        compile_schema(entry, payload, ptype, leaf_hash).alias(f"f{fid}")
        for fid, entry in sorted(schema.items())
        if entry is not RESERVED
    ]
    if not fields:
        struct = F.struct(F.lit(True).alias("_present"))
    else:
        struct = F.struct(*fields)
    # do_read(_, undefined) → undefined (feat.erl:113-114): a NULL
    # payload yields a NULL struct, not a struct of NULLs.
    return F.when(payload.isNull(), F.lit(None)).otherwise(struct)


def _compile_set(
    inner: FeatureSchema, payload: Column, ptype: T.DataType, leaf_hash=spark_leaf_hash
) -> Column:
    if not isinstance(ptype, T.ArrayType):
        return F.lit(None)
    elem_t = ptype.elementType
    tagged = F.transform(
        payload,
        lambda x, i: F.struct(
            compile_schema(inner, x, elem_t, leaf_hash).alias("f"), i.cast("int").alias("idx")
        ),
    )
    # array_sort on struct<f, idx>: canonical order by extracted
    # features, original index as deterministic tie-break — the engine
    # restatement of feat.erl:128-141 (order-insensitive identity,
    # original index retained).
    ordered = F.array_sort(tagged)
    return F.transform(
        ordered, lambda s: F.struct(s.getField("idx").alias("idx"), s.getField("f").alias("f"))
    )


def _compile_union(
    schema: UnionSchema, payload: Column, ptype: T.DataType, leaf_hash=spark_leaf_hash
) -> Column:
    if not isinstance(schema.variants, Mapping):
        raise InvalidUnionVariants(schema.variants)
    disc, _ = _access(payload, ptype, accessor_to_path(schema.accessor))
    # one struct field per distinct variant feature id; variants sharing
    # a feature id (feat_tests.erl:28-33 "a"/"a_other") share the field
    by_fid: dict[int, list] = {}
    invalid_variants: list = []
    for variant, spec in schema.variants.items():
        if not (
            isinstance(spec, tuple)
            and len(spec) == 2
            and isinstance(spec[0], int)
            and isinstance(spec[1], Mapping)
        ):
            # the reference errors only when a request *selects* the
            # invalid variant (feat.erl:172-173, feat_tests.erl:276-282)
            # — compile it to a runtime raise on that branch
            invalid_variants.append((variant, spec))
            continue
        by_fid.setdefault(spec[0], []).append((variant, spec[1]))

    variant_col = F.lit(None).cast("int")
    for variant, spec in schema.variants.items():
        if any(v == variant for v, _ in invalid_variants):
            variant_col = F.when(
                disc == F.lit(variant),
                F.raise_error(
                    F.lit(f"invalid_union_variant_schema: {variant!r}")
                ).cast("int"),
            ).otherwise(variant_col)
        else:
            variant_col = F.when(disc == F.lit(variant), F.lit(spec[0])).otherwise(variant_col)

    fields = [variant_col.alias("variant")]
    for fid, group in sorted(by_fid.items()):
        expr = F.lit(None)
        for variant, inner in group:
            expr = F.when(
                disc == F.lit(variant), _compile_map(inner, payload, ptype, leaf_hash)
            ).otherwise(expr)
        fields.append(expr.alias(f"v{fid}"))
    struct = F.struct(*fields)
    # missing discriminator or unknown variant → undefined
    # (feat.erl:152-154, :174-176); unknown-variant counts are surfaced
    # by lineage, not by the row value.
    return F.when(payload.isNull() | variant_col.isNull(), F.lit(None)).otherwise(struct)


def _null_of(schema: FeatureSchema) -> Column:
    return F.lit(None).cast("long") if is_accessor(schema) else F.lit(None)


def extract(
    df: DataFrame,
    schema: FeatureSchema,
    payload_col: str = "payload",
    out_col: str = "features",
    leaf_hash=spark_leaf_hash,
) -> DataFrame:
    """Engine extraction: adds ``out_col`` with the compiled feature
    structure. One narrow projection — no shuffle, no Python at run
    time; Catalyst prunes unreferenced payload subfields.

    Schema errors surface like the reference's: structurally
    uncompilable fragments raise here at plan time, while an invalid
    *union variant spec* raises only when a row actually selects that
    variant (runtime raise_error branch — feat.erl:172-173).
    """
    ptype = df.schema[payload_col].dataType
    return df.withColumn(
        out_col, compile_schema(schema, F.col(payload_col), ptype, leaf_hash)
    )
