"""Deterministic synthetic transcript generator (FIXTURES.md §A).

Produces the primary input table mandated by BASELINE.json's
``input_hint`` — ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)`` — plus the as-of right side
``conv_attrs (conv_id, ts, attr_hash, plan)``.

Everything is seeded numpy (default seed=42) and wall-clock free, so
the same (seed, n_convs) always yields byte-identical tables at any
scale — tests at ~2k turns, bench at millions — per FIXTURES.md:
* Zipf-skewed turn counts → a few *hot* conversations (exercises
  salted repartition / broadcast fallback);
* a fraction of rows emitted out of file order (exercises stable
  ``(conv_id, turn_idx)`` re-ordering);
* seeded role cycle user/assistant/tool; ``tool`` NULL on non-tool
  turns (exercises ffill/bfill + the undefined semantics of
  /root/reference/src/feat.erl:218-219);
* per-turn gaps 5s..45min with >30min session gaps and duplicate-ts
  ties (exercises session windows + ``orderBy(ts, turn_idx)``
  tie-breaks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EPOCH = np.datetime64("2026-01-01T00:00:00", "us")

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CONV_ATTRS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("attr_hash", T.LongType(), True),
        T.StructField("plan", T.StringType(), True),
    ]
)

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "code", "browse", "none"])
_PLANS = np.array(["free", "pro", "max"])
_VOCAB = np.array(
    "the a of to and in for on with spark shuffle window feature hash join "
    "turn agent tool plan token batch merge sort scan row table value key".split()
)


def _turn_counts(rng: np.random.Generator, n_convs: int, mean_turns: int) -> np.ndarray:
    """Zipf-skewed turn counts; the hottest conversation gets ~5% of all
    turns so skew handling is genuinely exercised."""
    raw = rng.zipf(1.7, n_convs).astype(np.int64)
    counts = np.clip(raw * max(1, mean_turns // 3), 2, mean_turns * 50)
    hot = max(counts.max() * 2, int(counts.sum() * 0.05))
    counts[0] = hot  # conv-00000000 is the designated heavy hitter
    return counts


def synth_transcripts_pdf(
    n_convs: int = 100, mean_turns: int = 20, seed: int = 42
) -> pd.DataFrame:
    """Generate the transcripts table as a pandas frame (file order is
    intentionally NOT (conv_id, turn_idx) order for ~5% of rows)."""
    rng = np.random.default_rng(seed)
    counts = _turn_counts(rng, n_convs, mean_turns)
    n = int(counts.sum())

    conv_ord = np.repeat(np.arange(n_convs), counts)
    # contiguous 0..k-1 turn_idx per conversation, vectorized
    first = np.zeros(n, dtype=bool)
    first[np.concatenate(([0], np.cumsum(counts)[:-1]))] = True
    turn_idx = np.arange(n, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )

    # timestamps: per-conv start offset + per-turn gaps (5s..45min),
    # ~4% session-breaking gaps (>30min), ~3% zero gaps (duplicate ts)
    gaps = rng.integers(5, 2700, n).astype(np.int64)
    kind = rng.random(n)
    gaps[kind < 0.04] = rng.integers(1801, 7200, int((kind < 0.04).sum()))
    gaps[(kind >= 0.04) & (kind < 0.07)] = 0
    gaps[first] = 0
    cs = np.cumsum(gaps)
    group_base = np.repeat(cs[first], counts)
    conv_start = rng.integers(0, 86_400 * 30, n_convs)[conv_ord]
    ts = EPOCH + ((conv_start + (cs - group_base)) * 1_000_000).astype("timedelta64[us]")

    role = _ROLES[turn_idx % 3]
    perturb = rng.random(n) < 0.02
    role[perturb] = _ROLES[rng.integers(0, 3, int(perturb.sum()))]

    tool = np.where(role == "tool", _TOOLS[rng.integers(0, 4, n)], None)

    # conv ids: format once per conversation, gather per row (a pandas
    # object-dtype concat here costs ~minutes at bench scale)
    ids = np.array([f"conv-{i:08d}" for i in range(n_convs)])
    conv_id = ids[conv_ord]
    blob = _VOCAB[rng.integers(0, len(_VOCAB), (n, 6))]
    # text assembly via Arrow compute (C++): identical strings to the
    # old pandas concat, ~50x faster at 38M rows
    import pyarrow as pa
    import pyarrow.compute as pc

    words = pc.binary_join_element_wise(*[pa.array(blob[:, j]) for j in range(6)], " ")
    text = pc.binary_join_element_wise(
        pa.array(conv_id), pc.cast(pa.array(turn_idx), pa.string()), words, ":"
    ).to_numpy(zero_copy_only=False)

    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )
    # emit ~5% of rows out of file order (stable-reordering fixture)
    perm = np.arange(n)
    sel = rng.choice(n, size=max(2, n // 20), replace=False)
    perm[sel] = perm[rng.permutation(sel)]
    return pdf.iloc[perm].reset_index(drop=True)


def synth_conv_attrs_pdf(
    n_convs: int = 100, seed: int = 42, attrs_per_conv: int = 3
) -> pd.DataFrame:
    """Sparse, slowly-changing per-conversation attributes: the as-of
    right side. Some conversations have attr rows only after their first
    turns → the NULL-before-first-attr (asymmetric-undefined) case."""
    rng = np.random.default_rng(seed + 1)
    k = rng.integers(1, attrs_per_conv + 1, n_convs)
    n = int(k.sum())
    conv_ord = np.repeat(np.arange(n_convs), k)
    conv_id = np.char.add("conv-", np.char.zfill(conv_ord.astype("U8"), 8))
    # attr timestamps spread over the same 30-day + activity horizon
    offs = rng.integers(0, 86_400 * 32, n).astype(np.int64)
    ts = EPOCH + (np.sort(offs) * 1_000_000).astype("timedelta64[us]")
    # sort within conv for readability; global order irrelevant
    order = np.lexsort((ts, conv_ord))
    return pd.DataFrame(
        {
            "conv_id": conv_id[order],
            "ts": pd.Series(ts[order]),
            "attr_hash": rng.integers(-(2**62), 2**62, n, dtype=np.int64)[order],
            "plan": _PLANS[rng.integers(0, 3, n)][order],
        }
    )


def synth_transcripts(
    spark: SparkSession, n_convs: int = 100, mean_turns: int = 20, seed: int = 42
) -> DataFrame:
    """Transcripts as a Spark DataFrame with the exact input_hint schema."""
    return spark.createDataFrame(
        synth_transcripts_pdf(n_convs, mean_turns, seed), schema=TRANSCRIPT_SCHEMA
    )


def synth_conv_attrs(
    spark: SparkSession, n_convs: int = 100, seed: int = 42, attrs_per_conv: int = 3
) -> DataFrame:
    return spark.createDataFrame(
        synth_conv_attrs_pdf(n_convs, seed, attrs_per_conv), schema=CONV_ATTRS_SCHEMA
    )


def write_synth_parquet(
    out_dir: str,
    n_convs: int,
    mean_turns: int,
    seed: int = 42,
    row_group_rows: int | None = None,
) -> None:
    """Materialize both tables as parquet (bench-scale path — pyarrow
    write avoids a Spark job for generation).

    Many small row groups (default: ~128 per table) so Spark can split
    the single file across tasks — a one-row-group file would serialize
    the scan stage and sink any multi-core scaling measurement.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)
    pdf = synth_transcripts_pdf(n_convs, mean_turns, seed)
    rg = row_group_rows or max(10_000, len(pdf) // 128)
    pq.write_table(
        pa.Table.from_pandas(pdf),
        os.path.join(out_dir, "transcripts.parquet"),
        row_group_size=rg,
    )
    pq.write_table(
        pa.Table.from_pandas(synth_conv_attrs_pdf(n_convs, seed)),
        os.path.join(out_dir, "conv_attrs.parquet"),
        row_group_size=rg,
    )
