"""Diff → request-field-path reporting.

Pure-Python mirror of feat:list_diff_fields/2 and its pathmap helpers
(/root/reference/src/feat.erl:355-457). Returns the string ``"all"``
for total/unpathable differences (the reference's ``all`` atom) or the
sorted list of dot-joined request paths.

The Spark-side equivalent is produced directly by
``feat_spark.operators.compare.compare_frames`` (its ``diff_paths``
column compiles the same trie rules into expressions); this module is
the driver-side oracle used for golden-vector parity
(feat_tests.erl:225-266).
"""

from __future__ import annotations

from typing import Any, Mapping

from feat_spark.operators.compare import DIFFERENCE
from feat_spark.schema import (
    FeatureSchema,
    SetSchema,
    UnionSchema,
    accessor_to_path,
    is_accessor,
    is_nested,
)


def list_diff_fields(schema: FeatureSchema, diff: Any):
    """feat.erl:355-370."""
    if diff == DIFFERENCE:
        return "all"
    paths = [".".join(keys) for keys in _unroll(_build_pathmap(diff, schema))]
    # empty ⇔ difference in features that lack a request key (top-level
    # union with shared fields — feat_tests.erl:244-266)
    return "all" if not paths else sorted(paths)


def _unroll(pathmap: Mapping) -> list[list[str]]:
    """Trie → key paths (feat.erl:372-385)."""
    out: list[list[str]] = []
    for key, rest in pathmap.items():
        if len(rest) == 0:
            out.append([key])
        else:
            out.extend([key, *nested] for nested in _unroll(rest))
    return out


def _build_pathmap(diff: Any, schema: FeatureSchema) -> dict:
    """feat.erl:387-398 — clause order matters: a total diff is pathable
    only against a bare accessor."""
    if diff == DIFFERENCE:
        if is_accessor(schema):
            return _nested_map(accessor_to_path(schema), {})
        return {}
    if isinstance(schema, SetSchema):
        return {
            str(i): _build_pathmap(d, schema.inner) for i, d in diff.items()
        }
    if is_nested(schema):
        return _nested_map(
            accessor_to_path(schema[0]), _build_pathmap(diff, schema[1])
        )
    if isinstance(schema, Mapping):
        return _build_pathmap_map(diff, schema)
    if isinstance(schema, UnionSchema):
        return _build_pathmap_union(diff, schema.variants)
    return {}


def _build_pathmap_union(diff: list, variants: Mapping) -> dict:
    """feat.erl:414-425: discriminator-changed diffs were minimized away
    upstream, so only same-variant diffs arrive; resolve the variant
    schema by feature name."""
    variant_fid, inner_diff = diff
    if inner_diff == DIFFERENCE:
        return {}
    for _value, (fid, variant_schema) in variants.items():
        if fid == variant_fid:
            return _build_pathmap_map(inner_diff, variant_schema)
    raise KeyError(f"no union variant with feature id {variant_fid}")


def _build_pathmap_map(diff: Mapping, schema: Mapping) -> dict:
    # ascending feature-id order mirrors Erlang's sorted small-map fold:
    # an empty (unpathable) child wipes the accumulator, later children
    # repopulate it — the fold order is semantics here (feat.erl:427-449)
    acc: dict = {}
    for fid in sorted(diff.keys()):
        acc = _merge_pathmaps(acc, _build_pathmap(diff[fid], schema[fid]))
    return acc


def _merge_pathmaps(left: dict, right: dict) -> dict:
    """feat.erl:437-449 — an empty right trie annihilates the merge
    (equal-or-unpathable subtree ⇒ the whole level loses its paths)."""
    if len(right) == 0:
        return {}
    if len(left) == 0:
        return right
    merged = dict(left)
    for key, rv in right.items():
        merged[key] = _merge_pathmaps(merged.get(key, {}), rv)
    return merged


def _nested_map(keys: list[str], init: dict) -> dict:
    """Wrap ``init`` under a key chain (feat.erl:451-452)."""
    out = init
    for key in reversed(keys):
        out = {key: out}
    return out
