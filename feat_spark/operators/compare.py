"""Idempotency comparison with diff minimization.

Pure surface — :func:`compare_value` / :func:`compare` — mirrors the
reference exactly (/root/reference/src/feat.erl:260-353):

* **asymmetric undefined** (feat.erl:278-284): ``new=value`` vs
  ``old=undefined`` is NOT a conflict (clients may start sending new
  fields); ``new=undefined`` vs ``old=value`` IS;
* **diff minimization** (feat.erl:326-353): a level whose children are
  *all* simple total-diffs collapses to one total diff; any equal child
  or any complex child keeps the per-key map (equal children decrement
  the simple counter to force divergence);
* **union short-circuit** (feat.erl:304-305): discriminator change ⇒
  total difference without descending;
* **set positional compare** (feat.erl:315-324): length gate, then
  position-wise over the canonically-ordered lists, diff keyed by the
  stored original index.

Spark surface — :func:`compare_frames` — compiles the same rules into
pure Column logic over two extracted feature columns (no UDFs): every
schema node becomes a ``struct<st:int, paths:array<string>>`` where
``st`` is 0=EQUAL / 1=TOTAL / 2=PARTIAL and ``paths`` are the
request-field paths of ``list_diff_fields`` (feat.erl:355-449),
including the pathmap annihilation rule (an unpathable differing child
erases its siblings' paths — feat.erl:437-438).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feat_spark.schema import (
    RESERVED,
    FeatureSchema,
    SetSchema,
    UnionSchema,
    accessor_to_path,
    is_accessor,
    is_nested,
)

#: total difference sentinel (?difference = -1, include/feat.hrl:4)
DIFFERENCE = -1


# ---------------------------------------------------------------------------
# pure-Python (reference-exact)
# ---------------------------------------------------------------------------


def compare(new: Any, old: Any):
    """feat:compare/2 → True | (False, diff) (feat.erl:260-269)."""
    diff = compare_value(new, old)
    if diff == DIFFERENCE:
        return (False, DIFFERENCE)
    if isinstance(diff, Mapping) and len(diff) > 0:
        return (False, diff)
    return True


def _is_union_features(x: Any) -> bool:
    return isinstance(x, list) and len(x) == 2 and isinstance(x[0], int)


def compare_value(new: Any, old: Any):
    """feat's compare_features/2 dispatch (feat.erl:271-289)."""
    if isinstance(new, Mapping) and isinstance(old, Mapping):
        return _compare_maps(new, old)
    if _is_union_features(new) and _is_union_features(old):
        return _compare_unions(new, old)
    if isinstance(new, list) and isinstance(old, list):
        return _compare_sets(new, old)
    if old is None:
        return {}  # new info is never a conflict (feat.erl:283-284)
    if new == old:
        return {}
    return DIFFERENCE


def _compare_maps(new: Mapping, old: Mapping):
    acc = _Acc()
    for key in new:
        acc.add(key, compare_value(new[key], old.get(key)))
    return acc.to_diff()


def _compare_unions(new: list, old: list):
    if new[0] != old[0]:
        return DIFFERENCE  # discriminator changed (feat.erl:304-305)
    inner = _compare_maps(new[1], old[1])
    if isinstance(inner, Mapping) and len(inner) == 0:
        return {}
    return [new[0], inner]


def _compare_sets(new: list, old: list):
    if len(new) != len(old):
        return DIFFERENCE  # length gate (feat.erl:315-316)
    acc = _Acc()
    for (idx, v_new), (_, v_old) in zip(new, old):
        acc.add(idx, compare_value(v_new, v_old))
    return acc.to_diff()


class _Acc:
    """Minimization accumulator (feat.erl:326-353): tracks
    (diff_map, simple_count); equal children *decrement* the counter so
    acc_to_diff's size==count collapse check diverges."""

    def __init__(self) -> None:
        self.diff: dict = {}
        self.simple = 0

    def add(self, key, diff) -> None:
        if diff == DIFFERENCE:
            self.diff[key] = DIFFERENCE
            self.simple += 1
        elif isinstance(diff, Mapping) and len(diff) == 0:
            self.simple -= 1
        else:
            self.diff[key] = diff

    def to_diff(self):
        if not self.diff and self.simple == 0:
            return {}
        if len(self.diff) == self.simple:
            return DIFFERENCE
        return self.diff


# ---------------------------------------------------------------------------
# Spark column compiler
# ---------------------------------------------------------------------------

_EQ, _TOTAL, _PARTIAL = 0, 1, 2
_NODE_T = "struct<st:int,paths:array<string>>"


def _node(st: Column, paths: Column) -> Column:
    return F.struct(st.cast("int").alias("st"), paths.alias("paths"))


def _no_paths() -> Column:
    return F.array().cast("array<string>")


def _bind(col: Column, fn) -> Column:
    """Let-binding for Column trees: evaluate ``col`` once and reference
    it many times through a higher-order-function lambda variable (a
    leaf node). Without this, every re-reference duplicates the whole
    subtree and deep schemas explode the unresolved plan exponentially
    (observed: JVM OOM while *constructing* the golden-schema compare)."""
    return F.get(F.transform(F.array(col), lambda x: fn(x)), 0)


def _guard(new: Column, old: Column, body: Column) -> Column:
    """The universal null rules, applied at every level
    (feat.erl:283-284 + :285-286 on whole subtrees)."""
    return (
        F.when(old.isNull(), _node(F.lit(_EQ), _no_paths()))
        .when(new.isNull(), _node(F.lit(_TOTAL), _no_paths()))
        .otherwise(body)
    )


def compile_compare(schema: FeatureSchema, new: Column, old: Column) -> Column:
    """Schema node → struct(st, paths) Column (plan-time recursion)."""
    if is_accessor(schema):
        path = ".".join(accessor_to_path(schema))
        # a differing leaf is ALWAYS pathable — including the
        # new-undefined-vs-old-value conflict — because
        # build_pathmap(?difference, Accessor) yields its key path
        # (feat.erl:387-388); the generic guard's empty-path TOTAL is
        # only for non-leaf wrappers
        return (
            F.when(old.isNull(), _node(F.lit(_EQ), _no_paths()))
            .when(new.isNull(), _node(F.lit(_TOTAL), F.array(F.lit(path))))
            .when(new == old, _node(F.lit(_EQ), _no_paths()))
            .otherwise(_node(F.lit(_TOTAL), F.array(F.lit(path))))
        )

    if is_nested(schema):
        acc = ".".join(accessor_to_path(schema[0]))
        child = compile_compare(schema[1], new, old)

        # TOTAL against a non-leaf wrapper is unpathable
        # (feat.erl:389-390); PARTIAL wraps: empty child paths → the
        # accessor itself (nested_map of an empty trie, feat.erl:451-452)
        def wrap(c):
            st = c.getField("st")
            cpaths = c.getField("paths")
            paths = F.when(
                st == _PARTIAL,
                F.when(F.size(cpaths) == 0, F.array(F.lit(acc))).otherwise(
                    F.transform(cpaths, lambda p: F.concat(F.lit(acc + "."), p))
                ),
            ).otherwise(_no_paths())
            return _node(st, paths)

        return _bind(child, wrap)

    if isinstance(schema, Mapping):
        children = [
            compile_compare(entry, new.getField(f"f{fid}"), old.getField(f"f{fid}"))
            for fid, entry in sorted(schema.items())
            if entry is not RESERVED
        ]
        return _guard(new, old, _combine_children(children))

    if isinstance(schema, UnionSchema):
        return _compile_union_compare(schema, new, old)

    if isinstance(schema, SetSchema):
        return _compile_set_compare(schema.inner, new, old)

    raise ValueError(f"uncompilable schema node: {schema!r}")


def _summarize(acc: Column, c: Column) -> Column:
    """One fold step over child nodes: status counts (accumulate,
    feat.erl:326-353) + sequential pathmap merge where a
    differing-but-unpathable child WIPES the accumulated paths and
    later children repopulate them (merge_pathmaps empty-right rule +
    Erlang's sorted small-map fold order, feat.erl:427-449)."""
    st = c.getField("st")
    cpaths = c.getField("paths")
    differing = st != _EQ
    return F.struct(
        (acc.getField("eq") + (st == _EQ).cast("int")).alias("eq"),
        (acc.getField("tot") + (st == _TOTAL).cast("int")).alias("tot"),
        (acc.getField("par") + (st == _PARTIAL).cast("int")).alias("par"),
        F.when(differing & (F.size(cpaths) == 0), _no_paths())
        .when(differing, F.concat(acc.getField("paths"), cpaths))
        .otherwise(acc.getField("paths"))
        .alias("paths"),
    )


_SUM_ZERO = lambda: F.struct(  # noqa: E731
    F.lit(0).alias("eq"), F.lit(0).alias("tot"), F.lit(0).alias("par"),
    _no_paths().alias("paths"),
)


def _node_of_summary(a: Column) -> Column:
    """acc_to_diff (feat.erl:345-353): all-simple ⇒ collapse to TOTAL;
    any equal or complex child keeps the per-key (PARTIAL) shape."""
    eq, tot, par = a.getField("eq"), a.getField("tot"), a.getField("par")
    st = (
        F.when((tot == 0) & (par == 0), F.lit(_EQ))
        .when((eq == 0) & (par == 0), F.lit(_TOTAL))
        .otherwise(F.lit(_PARTIAL))
    )
    paths = F.when(st == _PARTIAL, F.array_distinct(a.getField("paths"))).otherwise(
        _no_paths()
    )
    return _node(st, paths)


def _combine_children(children: Sequence[Column]) -> Column:
    """Fold child nodes (already in ascending feature-id order) into one
    node. Children are packed into an array and folded with ONE
    ``F.aggregate`` so each child expression appears exactly once in
    the plan — see ``_bind`` for why."""
    if not children:
        return _node(F.lit(_EQ), _no_paths())
    summary = F.aggregate(F.array(*children), _SUM_ZERO(), _summarize)
    return _bind(summary, _node_of_summary)


def _compile_union_compare(schema: UnionSchema, new: Column, old: Column) -> Column:
    by_fid: dict[int, Mapping] = {}
    for variant, spec in schema.variants.items():
        if not (
            isinstance(spec, tuple)
            and len(spec) == 2
            and isinstance(spec[0], int)
            and isinstance(spec[1], Mapping)
        ):
            continue  # invalid variant spec: no feature field exists
        fid, inner = spec
        # variants sharing a feature id share a compiled field; their
        # inner schemas are identical by construction in the reference's
        # fixtures — merge keys defensively
        merged = dict(by_fid.get(fid, {}))
        merged.update(inner)
        by_fid[fid] = merged

    nv, ov = new.getField("variant"), old.getField("variant")
    inner_cmp = _node(F.lit(_EQ), _no_paths())
    for fid, inner in sorted(by_fid.items()):
        child = _guard(
            new.getField(f"v{fid}"),
            old.getField(f"v{fid}"),
            _combine_children(
                [
                    compile_compare(e, new.getField(f"v{fid}").getField(f"f{f}"),
                                    old.getField(f"v{fid}").getField(f"f{f}"))
                    for f, e in sorted(inner.items())
                    if e is not RESERVED
                ]
            ),
        )
        inner_cmp = F.when(nv == fid, child).otherwise(inner_cmp)

    def shape(ic):
        ist = ic.getField("st")
        ipaths = ic.getField("paths")
        same_variant = (
            # inner TOTAL ⇒ minimized [variant, ?difference] — a *complex*
            # diff upstream (stored, not counted simple), unpathable
            # (feat.erl:306-313, :414-415)
            F.when(ist == _EQ, _node(F.lit(_EQ), _no_paths()))
            .when(ist == _TOTAL, _node(F.lit(_PARTIAL), _no_paths()))
            .otherwise(_node(F.lit(_PARTIAL), ipaths))
        )
        return F.when(nv != ov, _node(F.lit(_TOTAL), _no_paths())).otherwise(same_variant)

    return _guard(new, old, _bind(inner_cmp, shape))


def _compile_set_compare(inner: FeatureSchema, new: Column, old: Column) -> Column:
    # positional compare over the canonically-ordered arrays, diff keyed
    # by the NEW side's stored original index (feat.erl:315-324); the
    # element node is rewritten so its paths are already index-prefixed
    # (build_pathmap_set keys by index and never annihilates,
    # feat.erl:400-407)
    zipped = F.zip_with(
        new,
        old,
        lambda x, y: _bind(
            compile_compare(inner, x.getField("f"), y.getField("f")),
            lambda c: _node(
                c.getField("st"),
                F.when(c.getField("st") == _EQ, _no_paths())
                .when(
                    F.size(c.getField("paths")) == 0,
                    F.array(x.getField("idx").cast("string")),
                )
                .otherwise(
                    F.transform(
                        c.getField("paths"),
                        lambda p: F.concat(
                            x.getField("idx").cast("string"), F.lit("."), p
                        ),
                    )
                ),
            ),
        ),
    )

    def fold(z):
        # element nodes always carry non-empty paths when differing, so
        # the generic fold's wipe rule can never trigger here — the
        # semantics stay exactly build_pathmap_set's
        summary = F.aggregate(z, _SUM_ZERO(), _summarize)
        return _bind(summary, _node_of_summary)

    body = F.when(
        F.size(new) != F.size(old), _node(F.lit(_TOTAL), _no_paths())
    ).otherwise(_bind(zipped, fold))
    return _guard(new, old, body)


def compare_frames(
    new_df: DataFrame,
    old_df: DataFrame,
    schema: FeatureSchema,
    on: str | Sequence[str],
    features_col: str = "features",
    how: str = "inner",
) -> DataFrame:
    """Distributed feat:compare: join two feature frames on entity keys
    and evaluate the compiled diff per row.

    Output: keys + ``equal:boolean`` + ``diff_total:boolean`` +
    ``diff_paths:array<string>`` (sorted; NULL ⇔ the reference's ``all``
    sentinel — total diff or unpathable partial diff, feat.erl:355-370).

    Scale note: an equi-join on the entity key — sort-merge/shuffled-hash
    chosen by AQE; comparison itself is pure codegen'd expressions, zero
    Python.
    """
    keys = [on] if isinstance(on, str) else list(on)
    n = new_df.select(*keys, F.col(features_col).alias("__f_new"))
    o = old_df.select(*keys, F.col(features_col).alias("__f_old"))
    joined = n.join(o, on=keys, how=how)
    node = compile_compare(schema, F.col("__f_new"), F.col("__f_old"))
    out = joined.withColumn("__cmp", node)
    st = F.col("__cmp").getField("st")
    paths = F.col("__cmp").getField("paths")
    # trie-merge prefix absorption (feat.erl:372-385: a path ending at an
    # internal node of another path never unrolls): drop strict
    # dot-prefixes of sibling paths
    absorbed = F.filter(
        paths,
        lambda p: ~F.exists(
            paths, lambda q: (q != p) & q.startswith(F.concat(p, F.lit(".")))
        ),
    )
    return out.select(
        *keys,
        (st == _EQ).alias("equal"),
        (st == _TOTAL).alias("diff_total"),
        F.when(
            (st != _EQ) & (F.size(paths) > 0), F.array_sort(absorbed)
        ).alias("diff_paths"),
    )
