"""Golden fixtures ported from the reference test suite
(/root/reference/test/feat_tests.erl:13-138), re-encoded as Python/JSON
values (FIXTURES.md §B). Feature ids and structure are identical; leaf
hashes are produced by the configured hash function on both the engine
and the expected side (hash-algebra independence — SURVEY.md §2.1 #11).
"""

from feat_spark.schema import RESERVED, SetSchema, UnionSchema

COMMON_VALUES = 1000
COMMON_VALUE = 1111
COMMON_VALUE_2 = 1112
UNION = 2000

# ?SCHEMA (feat_tests.erl:13-58) — the 'invalid' variant spec is kept
# (error-path fixture); it only trips when a request selects it.
INVALID_VARIANT_SPEC = ("invalid_spec",)

SCHEMA = {
    1: (
        "1",
        SetSchema(
            {
                COMMON_VALUES: {
                    COMMON_VALUE: "common_value",
                    COMMON_VALUE_2: "common_value_2",
                },
                UNION: UnionSchema(
                    ["meta", "type"],
                    {
                        "a": (2, {21: "21", 22: RESERVED}),
                        # same variant structure, same feature name
                        "a_other": (2, {21: "21", 22: RESERVED}),
                        # same variant structure, different feature name
                        "A": (3, {21: "21", 22: RESERVED}),
                        # nested sets
                        "b": (4, {31: ("31", SetSchema({311: "311"}))}),
                        # tests correct list diff minimization
                        "c": (5, {41: ("41", {411: ("411", SetSchema({})), 412: "412"})}),
                        "unchanged": (42, {}),
                        "invalid": INVALID_VARIANT_SPEC,
                    },
                ),
            }
        ),
    )
}

# ?REQUEST (feat_tests.erl:60-96)
REQUEST = {
    "1": [
        {
            "meta": {"type": "a"},
            "21": "a_21",
            "unused": 42,
            "common_value": "common",
            "common_value_2": "common_2",
        },
        {
            "meta": {"type": "a"},
            "21": "a_21",
            "unused": 42,
            "common_value": "common",
        },
        {"meta": {"type": "a"}, "21": "a_21", "unused": 42},
        {
            "meta": {"type": "b"},
            "31": [{"311": "b_311_1"}, {"311": "b_311_2"}],
        },
        {
            "meta": {"type": "c"},
            "41": {"411": [], "412": "c_412"},
        },
        {"meta": {"type": "unchanged"}},
    ]
}

# ?OTHER_REQUEST (feat_tests.erl:98-138) — element 1 drops
# common_value (add-a-field-is-not-a-conflict fixture, :111-113)
OTHER_REQUEST = {
    "1": [
        {
            "meta": {"type": "a_other"},
            "21": "a_21_other",
            "unused": 43,
            "common_value": "common",
            "common_value_2": "other_common_2",
        },
        {"meta": {"type": "a"}, "21": "a_21_other", "unused": 43},
        {"meta": {"type": "A"}, "21": "a_21", "unused": 43},
        {
            "meta": {"type": "b"},
            "31": [{"311": "b_311_1_other"}, {"311": "b_311_2"}],
        },
        {
            "meta": {"type": "c"},
            "41": {"411": [], "412": "c_412_other"},
        },
        {"meta": {"type": "unchanged"}},
    ]
}


def expected_features(h):
    """feat_tests.erl:142-203 — canonical set order pins original
    indices value-DESCENDING: 0,1,2,4,3,5."""
    return {
        1: [
            [0, {
                COMMON_VALUES: {COMMON_VALUE: h("common"), COMMON_VALUE_2: h("common_2")},
                UNION: [2, {21: h("a_21")}],
            }],
            [1, {
                COMMON_VALUES: {COMMON_VALUE: h("common"), COMMON_VALUE_2: None},
                UNION: [2, {21: h("a_21")}],
            }],
            [2, {
                COMMON_VALUES: {COMMON_VALUE: None, COMMON_VALUE_2: None},
                UNION: [2, {21: h("a_21")}],
            }],
            [4, {
                COMMON_VALUES: {COMMON_VALUE: None, COMMON_VALUE_2: None},
                UNION: [5, {41: {411: [], 412: h("c_412")}}],
            }],
            [3, {
                COMMON_VALUES: {COMMON_VALUE: None, COMMON_VALUE_2: None},
                UNION: [4, {31: [[1, {311: h("b_311_2")}], [0, {311: h("b_311_1")}]]}],
            }],
            [5, {
                COMMON_VALUES: {COMMON_VALUE: None, COMMON_VALUE_2: None},
                UNION: [42, {}],
            }],
        ]
    }


def expected_diff(DIFF):
    """feat_tests.erl:205-223 — minimized difference."""
    return {
        1: {
            0: {UNION: [2, DIFF], COMMON_VALUES: {COMMON_VALUE_2: DIFF}},
            1: {UNION: [2, DIFF]},
            2: {UNION: DIFF},
            3: {UNION: [4, {31: {0: DIFF}}]},
            4: {UNION: [5, {41: {412: DIFF}}]},
        }
    }


# feat_tests.erl:225-242
EXPECTED_DIFF_PATHS = ["1.0", "1.1", "1.2", "1.3.31.0", "1.4.41.412"]

# top_level_sharing_union_test (feat_tests.erl:244-266)
SHARING_SCHEMA = {
    1: "common_field",
    2: UnionSchema(
        "type",
        {"a": (3, {5: "field"}), "b": (4, {5: "field"})},
    ),
}
SHARING_REQUEST = {"common_field": "common_value", "type": "a", "field": "value"}
SHARING_OTHER = dict(SHARING_REQUEST, type="b")

# all_events_test (feat_tests.erl:284-373)
EVENTS_SCHEMA = {
    1: (
        "key",
        SetSchema(
            UnionSchema(
                ["type"],
                {
                    "variant": (2, {3: "field", 4: ["nested", "field"]}),
                    "invalid": (2, "field"),
                },
            )
        ),
    )
}
EVENTS_REQUEST = {
    "key": [
        {"type": "variant", "field": "value"},
        {"type": "variant", "nested": ["nope"]},
        {"type": "missing"},
    ]
}
