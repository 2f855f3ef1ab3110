"""Golden-vector parity with the reference test suite
(/root/reference/test/feat_tests.erl) — pure driver-side engine, no
Spark session needed. Hash algebra: stable_hash on both sides
(hash-independence — the reference's tests also call feat:hash on the
expected side, feat_tests.erl:151-153)."""

import pytest

from feat_spark.functions.hashing import stable_hash
from feat_spark.operators.compare import DIFFERENCE, compare
from feat_spark.operators.extract import extract_value
from feat_spark.operators.paths import list_diff_fields
from feat_spark.schema import (
    InvalidSchema,
    InvalidUnionVariantSchema,
)

from fixtures_golden import (
    EVENTS_REQUEST,
    EVENTS_SCHEMA,
    EXPECTED_DIFF_PATHS,
    OTHER_REQUEST,
    REQUEST,
    SCHEMA,
    SHARING_OTHER,
    SHARING_REQUEST,
    SHARING_SCHEMA,
    expected_diff,
    expected_features,
)


def test_simple_featurefull_schema_read():
    """feat_tests.erl:142-203 — exact features incl. canonical set order
    0,1,2,4,3,5 (value-descending, original indices retained)."""
    assert extract_value(SCHEMA, REQUEST) == expected_features(stable_hash)


def test_simple_featurefull_schema_compare():
    """feat_tests.erl:205-223 — minimized difference."""
    feats = extract_value(SCHEMA, REQUEST)
    other = extract_value(SCHEMA, OTHER_REQUEST)
    assert compare(feats, other) == (False, expected_diff(DIFFERENCE))


def test_simple_featurefull_schema_list_diff_fields():
    """feat_tests.erl:225-242 — sorted dot paths."""
    feats = extract_value(SCHEMA, REQUEST)
    other = extract_value(SCHEMA, OTHER_REQUEST)
    verdict = compare(feats, other)
    assert verdict[0] is False
    assert list_diff_fields(SCHEMA, verdict[1]) == EXPECTED_DIFF_PATHS


def test_compare_is_reflexive():
    feats = extract_value(SCHEMA, REQUEST)
    assert compare(feats, feats) is True


def test_add_field_is_not_a_conflict():
    """feat_tests.erl:111-113: new request adds common_value that the
    old one lacked — must NOT contribute to the diff (element 1's diff
    is only the union leaf)."""
    feats = extract_value(SCHEMA, REQUEST)
    other = extract_value(SCHEMA, OTHER_REQUEST)
    _, diff = compare(feats, other)
    assert 1000 not in diff[1][1]  # COMMON_VALUES absent for element 1


def test_remove_field_is_a_conflict():
    """The asymmetry's other arm (feat.erl:278-289): compare in the
    opposite direction and element 1 (old idx 1) must now conflict on
    common_value."""
    feats = extract_value(SCHEMA, REQUEST)
    other = extract_value(SCHEMA, OTHER_REQUEST)
    verdict = compare(other, feats)
    assert verdict[0] is False
    assert 1000 in verdict[1][1][1]


def test_top_level_sharing_union():
    """feat_tests.erl:244-266 — diff {2: DIFF}, paths = all."""
    f1 = extract_value(SHARING_SCHEMA, SHARING_REQUEST)
    f2 = extract_value(SHARING_SCHEMA, SHARING_OTHER)
    verdict = compare(f1, f2)
    assert verdict == (False, {2: DIFFERENCE})
    assert list_diff_fields(SHARING_SCHEMA, verdict[1]) == "all"


def test_fail_on_invalid_schema():
    """feat_tests.erl:268-274."""
    with pytest.raises(InvalidSchema):
        extract_value({42: ("my", "cool", "schema")}, {"key": "value"})


def test_fail_on_missing_variant_spec():
    """feat_tests.erl:276-282 — hitting the 'invalid' variant raises."""
    with pytest.raises(InvalidUnionVariantSchema):
        extract_value(SCHEMA, {"1": [{"meta": {"type": "invalid"}}]})


def test_unknown_variant_is_undefined():
    """feat.erl:174-176: unknown discriminator value → undefined +
    missing_union_variant event."""
    events = []
    out = extract_value(
        SCHEMA, {"1": [{"meta": {"type": "???"}}]}, events=events.append
    )
    assert out == {1: [[0, {1000: {1111: None, 1112: None}, 2000: None}]]}
    assert any(e[0] == "missing_union_variant" for e in events)


def test_all_events():
    """feat_tests.erl:284-373 — the complete golden event sequence:
    visit/visited bracketing, canonical set-visit order (2,0,1),
    missing-variant and invalid-fragment placement."""
    events = []
    extract_value(EVENTS_SCHEMA, EVENTS_REQUEST, events=events.append)

    elements = EVENTS_REQUEST["key"]
    e0, e1, e2 = elements
    schema_obj = EVENTS_SCHEMA[1][1].inner  # the UnionSchema

    expected = [
        ("request_visited", EVENTS_REQUEST),
        ("request_key_visit", "key", elements),
        # set elements visited in canonical (term) order: e2, e0, e1
        ("request_index_visit", 2, e2),
        ("request_key_visit", "type", "missing"),
        ("missing_union_variant", "missing", e2, schema_obj),
        ("request_key_visited", "type", "missing"),
        ("request_index_visited", 2, e2),
        ("request_index_visit", 0, e0),
        ("request_key_visit", "type", "variant"),
        ("request_key_visited", "type", "variant"),
        ("request_variant_visit", 2, "variant", e0),
        ("request_key_visit", "field", "value"),
        ("request_key_visited", "field", "value"),
        ("request_variant_visited", 2, "variant", e0),
        ("request_index_visited", 0, e0),
        ("request_index_visit", 1, e1),
        ("request_key_visit", "type", "variant"),
        ("request_key_visited", "type", "variant"),
        ("request_variant_visit", 2, "variant", e1),
        ("request_key_visit", "nested", ["nope"]),
        ("invalid_schema_fragment", ["field"], ["nope"]),
        ("request_key_visited", "nested", ["nope"]),
        ("request_variant_visited", 2, "variant", e1),
        ("request_index_visited", 1, e1),
        ("request_key_visited", "key", elements),
    ]
    assert events == expected


def test_set_order_insensitivity():
    """Shuffling set input order leaves canonical features identical up
    to the retained original indices (the set-identity property the
    canonical encoding exists for, feat.erl:128-141)."""
    shuffled = {"1": list(reversed(REQUEST["1"]))}
    base = extract_value(SCHEMA, REQUEST)
    shuf = extract_value(SCHEMA, shuffled)
    strip = lambda feats: [f for _, f in feats[1]]
    assert strip(base) == strip(shuf)
    # and compare() sees them as identical
    assert compare(base, shuf) is True
