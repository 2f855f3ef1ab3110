"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The Spark-side contract is fully real and tested — schema, batch
iteration, partition sizing, null/corrupt handling, deterministic fake
decoder — while the actual codec calls are stubs behind
``feat_spark.operators.multimodal.DECODERS`` (the image/audio libraries
are not in this container; a deployment registers real decoders with
:func:`register_decoder` and nothing else changes).

Design for 100 TB of media:
* media rides in its own column family / table keyed by
  ``(conv_id, turn_idx, media_idx)`` — NEVER inline with text rows you
  scan for cheap features (column pruning keeps scans media-free, the
  Spark analogue of feat's visit-only-schema-paths rule,
  /root/reference/src/feat.erl:181-191);
* decode/feature-extract runs in ``mapInPandas`` with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned DOWN (big
  cells -> small batches, bounding executor memory);
* outputs are compact numeric features (embeddings, durations,
  dimensions) so everything downstream is columnar again.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("media_idx", T.IntegerType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("media_idx", T.IntegerType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_hash", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),    # image/video
        T.StructField("height", T.IntegerType(), True),   # image/video
        T.StructField("duration_ms", T.LongType(), True), # audio/video
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

#: decoder registry: media_type -> callable(bytes) -> dict of feature
#: fields (width/height/duration_ms). Deployments overwrite these.
DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes], dict]) -> None:
    DECODERS[media_type] = fn


def _stub_decoder(media_type: str) -> Callable[[bytes], dict]:
    def fn(payload: bytes) -> dict:
        raise NotImplementedError(
            f"no {media_type} codec in this environment - register one "
            "with feat_spark.operators.multimodal.register_decoder"
        )

    return fn


def deterministic_fake_decoder(media_type: str) -> Callable[[bytes], dict]:
    """Seeded stand-in used by tests and sandbox runs: derives plausible
    metadata purely from the payload bytes, so the whole distributed
    path is exercised end-to-end and reproducibly."""

    def fn(payload: bytes) -> dict:
        h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
        if media_type == "image":
            return {"width": 64 + h % 1024, "height": 64 + (h >> 10) % 1024}
        if media_type == "audio":
            return {"duration_ms": 200 + h % 600_000}
        return {
            "width": 64 + h % 1920, "height": 64 + (h >> 10) % 1080,
            "duration_ms": 1000 + h % 3_600_000,
        }

    return fn


def extract_media_features(
    media: DataFrame,
    decoders: dict[str, Callable[[bytes], dict]] | None = None,
    batch_size: int = 64,
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas``.

    Corrupt/undecodable payloads produce ``decode_ok=false`` rows (the
    asymmetric-missing philosophy of the reference: absence is data,
    not an error — /root/reference/src/feat.erl:283-284). The cheap
    features (size, stable hash) come from the bytes without any codec.
    """
    active = dict(decoders) if decoders is not None else dict(DECODERS)
    out_cols = [f.name for f in MEDIA_FEATURE_SCHEMA]  # captured by value:
    # the worker-side closure must not reference module globals, so it
    # stays importable even when feat_spark isn't on the executor path

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as pd  # local import: closure is self-contained

        def _hash(b):
            return int.from_bytes(
                hashlib.blake2b(b, digest_size=8).digest(), "little", signed=True
            )

        for pdf in batches:
            # cheap byte features: pandas column ops (NULL-aware), no
            # per-row frame assembly — only codec dispatch stays a loop
            out = pdf[["conv_id", "turn_idx", "media_idx", "media_type"]].copy()
            payload = pdf["payload"]
            out["n_bytes"] = payload.map(len, na_action="ignore").astype("Int64")
            out["payload_hash"] = payload.map(_hash, na_action="ignore").astype(
                "Int64"
            )

            width, height, dur, ok = [], [], [], []
            for mt, b in zip(pdf["media_type"], payload):
                rec = {}
                done = False
                if b is not None:
                    dec = active.get(mt) or _stub_decoder(mt)
                    try:
                        rec = dec(b)
                        done = True
                    except NotImplementedError:
                        raise
                    except Exception:  # corrupt payload -> missing, not fatal
                        pass
                width.append(rec.get("width"))
                height.append(rec.get("height"))
                dur.append(rec.get("duration_ms"))
                ok.append(done)
            out["width"] = pd.array(width, dtype="Int32")
            out["height"] = pd.array(height, dtype="Int32")
            out["duration_ms"] = pd.array(dur, dtype="Int64")
            out["decode_ok"] = ok
            yield out[out_cols]

    spark = media.sparkSession
    # big binary cells -> small Arrow batches, bounding executor memory
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return media.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


def synth_media(spark, n_convs: int = 10, per_conv: int = 3, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    kinds = ("image", "audio", "video")
    for c in range(n_convs):
        for m in range(per_conv):
            kind = kinds[(c + m) % 3]
            payload = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
            rows.append((f"conv-{c:08d}", m, m, kind, f"{kind}/x-fake", bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    id_col: str,
    duration_col: str,
    k: int = 8,
) -> DataFrame:
    """Uniform frame-sampling plan for media columns — which K
    timestamps to decode per asset: the Spark-side plumbing of a video
    feature pipeline (the decode itself is the codec registry's job;
    see the module's stub contract). Midpoint sampling,
    ``t_i = (2i+1) * duration / 2k``, so frames sit centered in equal
    bins rather than bunched at 0 — the convention frame samplers
    (ffmpeg fps filters, CLIP-video preprocessors) actually use.

    All-integer arithmetic: duration quantizes to ms once
    (``round(d*1000)``), each offset is one integer floor-division —
    bit-replayable, no float drift across engines. One
    ``explode(sequence(0, k-1))`` — output grain is assets×k, a pure
    scan-side fan-out with no shuffle; the plan joins back to the
    binary column only inside the decode stage's mapInPandas batches.
    Non-positive durations yield no rows (nothing to decode).
    """
    dur_ms = F.round(F.col(duration_col) * 1000).cast("long")
    return (
        df.filter(F.col(duration_col) > 0)
        .select(
            F.col(id_col).alias("id"),
            dur_ms.alias("__ms"),
            F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias(
                "frame_idx"
            ),
        )
        .select(
            "id",
            "frame_idx",
            F.expr(f"((2 * frame_idx + 1) * __ms) div {2 * int(k)}").alias(
                "t_ms"
            ),
        )
    )
