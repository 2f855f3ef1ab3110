"""Feature-extraction schema model + validation.

A faithful Python restatement of the reference's schema algebra
(/root/reference/src/feat.erl:5-23):

* **accessor** — ``str`` key or non-empty ``list[str]`` path into the
  nested payload;
* **map schema** — ``dict[int, entry]`` mapping integer feature ids to
  entries; an entry is an accessor (leaf hash), ``(accessor, schema)``
  (descend then apply), an inner schema (map/set/union), or
  :data:`RESERVED` (tombstoned id, skipped at read —
  feat.erl:184-185);
* ``SetSchema(inner)`` — order-insensitive collection with canonical
  re-ordering (feat.erl:128-141);
* ``UnionSchema(accessor, variants)`` — tagged union discriminated by
  the value at ``accessor``; ``variants`` maps discriminator value →
  ``(feature_id, map_schema)`` (feat.erl:143-179).

Feature ids are **integers** by design (compact, stable across renames
— feat.erl:35).

``validate_schema`` implements the validator the reference's README
lists as TODO (/root/reference/README.md:19-32) and raises the same
error classes feat raises lazily at read time
(feat.erl:125-126, :172-179) — but at *plan* time, before any Spark
job runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping


class _Reserved:
    """Singleton marker for tombstoned feature ids (feat.erl:184-185)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "RESERVED"


RESERVED = _Reserved()

#: accessor: str | list[str]
Accessor = Any
#: schema: Mapping[int, entry] | SetSchema | UnionSchema | accessor | (accessor, schema)
FeatureSchema = Any


@dataclass(frozen=True)
class SetSchema:
    """Order-insensitive collection of sub-payloads (feat.erl:13)."""

    inner: FeatureSchema


@dataclass(frozen=True)
class UnionSchema:
    """Tagged union: ``accessor`` reads the discriminator, ``variants``
    maps its value to ``(feature_id, map_schema)`` (feat.erl:15)."""

    accessor: Accessor
    variants: Mapping[Any, tuple]


class InvalidSchema(ValueError):
    """Mirrors ``error({invalid_schema, Fragment})`` (feat.erl:125-126)."""

    def __init__(self, fragment: Any):
        self.fragment = fragment
        super().__init__(f"invalid schema fragment: {fragment!r}")


class InvalidUnionVariants(ValueError):
    """Mirrors ``error({invalid_union_variants, _})`` (feat.erl:178-179)."""


class InvalidUnionVariantSchema(ValueError):
    """Mirrors ``error({invalid_union_variant_schema, ...})``
    (feat.erl:172-173)."""

    def __init__(self, variant: Any, fragment: Any):
        self.variant = variant
        self.fragment = fragment
        super().__init__(f"invalid union variant schema for {variant!r}: {fragment!r}")


def is_accessor(x: Any) -> bool:
    return isinstance(x, str) or (
        isinstance(x, list) and len(x) > 0 and all(isinstance(k, str) for k in x)
    )


def accessor_to_path(acc: Accessor) -> list[str]:
    """Normalize accessor to a key list (feat.erl:454-457)."""
    return [acc] if isinstance(acc, str) else list(acc)


def is_nested(x: Any) -> bool:
    """``(accessor, schema)`` — descend then apply (feat.erl:121-122)."""
    return isinstance(x, tuple) and len(x) == 2 and is_accessor(x[0])


def validate_schema(schema: FeatureSchema, _path: tuple = ()) -> None:
    """Recursively validate; raises the matching Invalid* error for the
    first bad fragment. Strict-at-compile: the reference only detects
    these lazily when a request happens to touch the fragment."""
    if schema is RESERVED:
        return
    if is_accessor(schema):
        return
    if isinstance(schema, SetSchema):
        validate_schema(schema.inner, (*_path, "set"))
        return
    if isinstance(schema, UnionSchema):
        if not is_accessor(schema.accessor):
            raise InvalidSchema(schema.accessor)
        if not isinstance(schema.variants, Mapping):
            raise InvalidUnionVariants(schema.variants)
        for variant, spec in schema.variants.items():
            if (
                not isinstance(spec, tuple)
                or len(spec) != 2
                or not isinstance(spec[0], int)
                or not isinstance(spec[1], Mapping)
            ):
                raise InvalidUnionVariantSchema(variant, spec)
            validate_schema(spec[1], (*_path, f"variant:{variant}"))
        return
    if is_nested(schema):
        validate_schema(schema[1], (*_path, str(schema[0])))
        return
    if isinstance(schema, Mapping):
        for fid, entry in schema.items():
            if not isinstance(fid, int) or fid < 0:
                raise InvalidSchema({fid: entry})
            validate_schema(entry, (*_path, fid))
        return
    raise InvalidSchema(schema)
