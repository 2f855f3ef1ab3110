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
        body = F.when(new == old, _node(F.lit(_EQ), _no_paths())).otherwise(
            # a differing leaf is pathable: build_pathmap(?difference,
            # Accessor) → its key path (feat.erl:387-388)
            _node(F.lit(_TOTAL), F.array(F.lit(path)))
        )
        return _guard(new, old, body)

    if is_nested(schema):
        acc = ".".join(accessor_to_path(schema[0]))
        child = compile_compare(schema[1], new, old)
        st = child.getField("st")
        cpaths = child.getField("paths")
        # TOTAL against a non-leaf wrapper is unpathable
        # (feat.erl:389-390); PARTIAL wraps: empty child paths → the
        # accessor itself (nested_map of an empty trie, feat.erl:451-452)
        paths = F.when(st == _PARTIAL,
                       F.when(F.size(cpaths) == 0, F.array(F.lit(acc)))
                        .otherwise(F.transform(cpaths, lambda p: F.concat(F.lit(acc + "."), p)))
                       ).otherwise(_no_paths())
        return _node(st, paths)

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


def _combine_children(children: Sequence[Column]) -> Column:
    """accumulate/acc_to_diff (feat.erl:326-353) + pathmap merge with
    annihilation (feat.erl:427-449) over plan-time child list."""
    if not children:
        return _node(F.lit(_EQ), _no_paths())
    eq = sum((F.when(c.getField("st") == _EQ, 1).otherwise(0) for c in children), F.lit(0))
    tot = sum((F.when(c.getField("st") == _TOTAL, 1).otherwise(0) for c in children), F.lit(0))
    par = sum((F.when(c.getField("st") == _PARTIAL, 1).otherwise(0) for c in children), F.lit(0))

    st = (
        F.when((tot == 0) & (par == 0), F.lit(_EQ))
        .when((eq == 0) & (par == 0), F.lit(_TOTAL))
        .otherwise(F.lit(_PARTIAL))
    )
    # sequential pathmap merge in ascending feature-id order: a
    # differing-but-unpathable child WIPES the accumulator, later
    # children repopulate it (merge_pathmaps empty-right rule +
    # Erlang's sorted small-map fold order, feat.erl:427-449) —
    # `children` arrives sorted by feature id from the compilers
    merged = _no_paths()
    for c in children:
        differing = c.getField("st") != _EQ
        cpaths = c.getField("paths")
        merged = (
            F.when(differing & (F.size(cpaths) == 0), _no_paths())
            .when(differing, F.concat(merged, cpaths))
            .otherwise(merged)
        )
    paths = F.when(st == _PARTIAL, F.array_distinct(merged)).otherwise(_no_paths())
    return _node(st, paths)


def _compile_union_compare(schema: UnionSchema, new: Column, old: Column) -> Column:
    by_fid: dict[int, Mapping] = {}
    for variant, (fid, inner) in schema.variants.items():
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

    ist = inner_cmp.getField("st")
    ipaths = inner_cmp.getField("paths")
    same_variant = (
        # inner TOTAL ⇒ minimized [variant, ?difference] — a *complex*
        # diff upstream (stored, not counted simple), unpathable
        # (feat.erl:306-313, :414-415)
        F.when(ist == _EQ, _node(F.lit(_EQ), _no_paths()))
        .when(ist == _TOTAL, _node(F.lit(_PARTIAL), _no_paths()))
        .otherwise(_node(F.lit(_PARTIAL), ipaths))
    )
    body = F.when(nv != ov, _node(F.lit(_TOTAL), _no_paths())).otherwise(same_variant)
    return _guard(new, old, body)


def _compile_set_compare(inner: FeatureSchema, new: Column, old: Column) -> Column:
    zipped = F.zip_with(
        new,
        old,
        lambda x, y: F.struct(
            x.getField("idx").alias("idx"),
            compile_compare(inner, x.getField("f"), y.getField("f")).alias("c"),
        ),
    )
    eq = F.size(F.filter(zipped, lambda z: z.getField("c").getField("st") == _EQ))
    tot = F.size(F.filter(zipped, lambda z: z.getField("c").getField("st") == _TOTAL))
    par = F.size(F.filter(zipped, lambda z: z.getField("c").getField("st") == _PARTIAL))
    n = F.size(zipped)

    st = (
        F.when(n == 0, F.lit(_EQ))
        .when((tot == 0) & (par == 0), F.lit(_EQ))
        .when((eq == 0) & (par == 0), F.lit(_TOTAL))
        .otherwise(F.lit(_PARTIAL))
    )
    # set paths are always keyed by stored original index
    # (build_pathmap_set, feat.erl:400-407): element path alone when the
    # element's own trie is empty, else prefixed — no annihilation here
    elem_paths = F.flatten(
        F.transform(
            F.filter(zipped, lambda z: z.getField("c").getField("st") != _EQ),
            lambda z: F.when(
                F.size(z.getField("c").getField("paths")) == 0,
                F.array(z.getField("idx").cast("string")),
            ).otherwise(
                F.transform(
                    z.getField("c").getField("paths"),
                    lambda p: F.concat(z.getField("idx").cast("string"), F.lit("."), p),
                )
            ),
        )
    )
    paths = F.when(st == _PARTIAL, elem_paths).otherwise(_no_paths())
    body = F.when(
        F.size(new) != F.size(old), _node(F.lit(_TOTAL), _no_paths())
    ).otherwise(_node(st, paths))
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
