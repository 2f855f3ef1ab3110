"""feat_spark — a PySpark-native point-in-time feature-engineering engine.

A from-scratch reimagining of the capabilities of ``rbkmoney/feat``
(/root/reference/src/feat.erl — a per-request Erlang feature-extraction
library) as a distributed, DataFrame-first engine over conversation /
agent transcript tables:

* deterministic stable-hash feature extraction from nested payloads
  (schema-compiled Column expressions, ``feat_spark.operators.extract``);
* idempotency comparison with asymmetric missing-data semantics and diff
  minimization (``feat_spark.operators.compare``);
* diff → request-field-path reporting (``feat_spark.operators.paths``);
* point-in-time (as-of) joins with broadcast/skew fallbacks
  (``feat_spark.operators.asof``);
* windowed features — lag/lead, tumbling/sliding/session windows,
  forward/backward fill, leakage-safe cumulative frames
  (``feat_spark.operators.windows`` / ``sessionize``);
* large-scale training-data ops — dedup (exact/MinHash-LSH/SimHash),
  similarity search, text quality/language features
  (``feat_spark.operators.dedup`` / ``similarity``,
  ``feat_spark.functions.text``);
* per-partition lineage + metrics, watermark checkpoints with
  exactly-once resume (``feat_spark.plans.lineage`` / ``checkpoint``).

Everything is expressed through ``pyspark.sql`` DataFrame expressions,
Window specs and Arrow-vectorized pandas UDFs — never per-row Python.
"""

from feat_spark.session import get_spark
from feat_spark.sources.io import read_table, write_table
from feat_spark.sources.synth import synth_conv_attrs, synth_transcripts
from feat_spark.operators.asof import asof_join
from feat_spark.operators.windows import (
    backward_fill,
    cumulative_features,
    forward_fill,
    lag_lead_features,
    top_k_per_group,
    tumbling_window_agg,
    with_stable_order,
)
from feat_spark.operators.sessionize import sessionize
from feat_spark.schema import (
    RESERVED,
    FeatureSchema,
    SetSchema,
    UnionSchema,
    validate_schema,
)
from feat_spark.operators.extract import extract, extract_value
from feat_spark.operators.compare import DIFFERENCE, compare, compare_value
from feat_spark.operators.paths import list_diff_fields

__all__ = [
    "get_spark",
    "read_table",
    "write_table",
    "synth_transcripts",
    "synth_conv_attrs",
    "asof_join",
    "with_stable_order",
    "lag_lead_features",
    "cumulative_features",
    "forward_fill",
    "backward_fill",
    "tumbling_window_agg",
    "top_k_per_group",
    "sessionize",
    "FeatureSchema",
    "SetSchema",
    "UnionSchema",
    "RESERVED",
    "validate_schema",
    "extract",
    "extract_value",
    "compare",
    "compare_value",
    "DIFFERENCE",
    "list_diff_fields",
]

__version__ = "0.1.0"
