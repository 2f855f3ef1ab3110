"""Vectorized pandas-UDF surfaces (SURVEY.md §2.11).

Everything the engine computes in its hot paths is JVM-side; these
UDFs exist for logic Spark expressions cannot say (custom models,
compiled tokenizers) and demonstrate each sanctioned shape:

* scalar Series->Series (Arrow-batched)
* iterator Iterator[Series]->Iterator[Series] — amortizes one-time
  init (compiled regex / loaded model) across all batches of a task
* GROUPED_AGG Series->scalar

Each is oracle-gated in __spark_entry__.py by computing the SAME
function as pure SQL — the UDFs are bit-compatible with their column
-expression twins (same IEEE double ops in the same order).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def quality_score_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Iterator-form text quality score — identical math to
    functions/text.py::quality_score (length sweet-spot x lexical
    diversity x (1 - punct density), 6dp), with the regex compiled ONCE
    per executor task rather than once per batch."""
    import re

    word_re = re.compile(r"\s+")
    punct_re = re.compile(r"[^A-Za-z0-9_\s]")

    for s in texts:
        stripped = s.fillna("").str.strip()
        words = stripped.apply(lambda t: word_re.split(t) if t else [""])
        n_words = words.str.len().astype("float64")
        distinct = words.apply(lambda w: len(set(w))).astype("float64")
        n_chars = s.fillna("").str.len().astype("float64")
        n_punct = s.fillna("").apply(lambda t: len(punct_re.findall(t))).astype("float64")
        len_score = (n_words / 50.0).clip(upper=1.0)
        diversity = distinct / n_words.clip(lower=1.0)
        punct_ratio = n_punct / n_chars.clip(lower=1.0)
        yield (len_score * diversity * (1.0 - punct_ratio)).round(6)


@pandas_udf(DoubleType())
def value_spread_udf(values: pd.Series) -> float:
    """GROUPED_AGG shape: max - min of a numeric column per group —
    the template for custom per-window statistics."""
    if values.empty:
        return None
    return float(values.max() - values.min())


def sentence_split_udtf_class():
    """Python UDTF (Spark 4 table function — the §2.11 surface the
    pandas shapes don't cover): one input row -> N output rows.

    Splits text into sentences on ``[.!?]+\\s*`` (RE2-safe — no
    lookbehind, so the DuckDB oracle's regexp_split_to_array replays
    it exactly) and yields ``(pos, sentence, n_words)`` per non-empty
    sentence. This exact logic IS expressible relationally
    (posexplode over regexp split — see the `word_explode` gate); the
    UDTF exists to cover the surface a custom tokenizer/parser would
    need, where per-row Python with multi-row yield is the honest
    shape. Row-based Python = the slow path, said out loud: use it
    when the logic can't be a Column expression, not before.

    Returned as a factory so importing this module never requires the
    udtf machinery (keeps cold paths import-light).
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string, n_words int")
    class SplitSentences:
        # explicit [\t\n\f\r ] class, NOT \s: Python's \s on str is
        # Unicode-aware (matches NBSP, \x0b, …) while RE2's \s is
        # exactly these five bytes — the oracle must replay every edge
        SPLIT = re.compile(r"[.!?]+[\t\n\f\r ]*")
        WS = re.compile(r"[\t\n\f\r ]+")

        def eval(self, text):
            if text is None:
                return
            pos = 0
            for part in self.SPLIT.split(text):
                part = part.strip("\t\n\f\r ")
                if part:
                    n_words = len([w for w in self.WS.split(part) if w])
                    yield pos, part, n_words
                    pos += 1

    return SplitSentences


def arrow_text_bytes(df, id_col: str, text_col: str):
    """The ``mapInArrow`` UDF surface (SURVEY §2.11): per-batch
    Arrow-native compute with ZERO pandas materialization — the
    lowest-overhead Python hook Spark offers, the one to reach for
    when the per-batch work is itself vectorized (pyarrow.compute,
    numpy over buffers) and the pandas conversion would be pure tax.

    Emits ``(id, n_bytes, n_chars)`` — UTF-8 byte length vs character
    length (their ratio is the multibyte detector). Feature math runs
    inside pyarrow.compute on the Arrow buffers; the batch never
    becomes Python objects. Deterministic, embarrassingly parallel,
    no shuffle.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql import functions as F  # noqa: F401 (parity with module style)

    def mapper(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(id_col),
                    pc.cast(pc.binary_length(b.column(text_col)), pa.int64()),
                    pc.cast(pc.utf8_length(b.column(text_col)), pa.int64()),
                ],
                ["id", "n_bytes", "n_chars"],
            )

    return df.select(id_col, text_col).mapInArrow(
        mapper, schema="id long, n_bytes long, n_chars long"
    )
