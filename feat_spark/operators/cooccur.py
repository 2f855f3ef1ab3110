"""Word co-occurrence + PMI over a document corpus — the statistic
under embedding training data (word2vec/GloVe co-occurrence counts),
collocation mining, and topic drift checks.

All-pairs-within-a-document is O(m^2) per doc, so the operator caps
tokens per document FIRST (top ``per_doc`` by in-doc frequency, word
ascending as the deterministic tiebreak — the same pigeonhole-cap
device as the SimHash chunk blocking and the LSH star cap). After the
cap, the pair generator is a self-equi-join on ``doc_id`` (tiny
per-key fan-out, never a cartesian), the pair counts are one
map-side-combinable aggregation on the pair key, and a frequency
floor prunes the Zipf tail before PMI is computed. The plan is the
same shape at 500 docs and 5 billion.

PMI math is cross-engine exact by construction: counts are BIGINTs,
one integer-product division, one ``ln``, round 6 (the device proven
by ``tfidf_topk`` and the classifier sigmoid gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import words


def cooccurrence_pmi(
    df: DataFrame,
    per_doc: int = 12,
    min_pairs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(word_a, word_b, n_ab, pmi)`` for unordered word pairs
    co-occurring in >= ``min_pairs`` distinct documents, over each
    document's top ``per_doc`` most frequent words.

    ``pmi = ln(n_ab * N / (n_a * n_b))`` with N = total docs and
    n_a/n_b = per-word doc frequency COUNTED AFTER the cap, so the
    probability space is self-consistent (every count refers to the
    same capped corpus and PMI(a,b) <= min(-ln p_a, -ln p_b) holds).
    """
    n_docs = df.select(id_col).distinct().count()
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("word").asc())
    top = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_doc)
        .select("doc_id", "word")
    )
    dfreq = top.groupBy("word").agg(F.count(F.lit(1)).alias("n_w"))
    pairs = (
        top.alias("a")
        .join(top.alias("b"), "doc_id")
        .filter(F.col("a.word") < F.col("b.word"))
        .groupBy(
            F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    return (
        pairs.join(dfreq.select(F.col("word").alias("word_a"), F.col("n_w").alias("n_a")), "word_a")
        .join(dfreq.select(F.col("word").alias("word_b"), F.col("n_w").alias("n_b")), "word_b")
        .select(
            "word_a",
            "word_b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") * F.lit(n_docs)).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


def skipgram_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: "list[str] | tuple" = ("ts", "event_id"),
    token_col: str = "event_type",
    window: int = 3,
) -> DataFrame:
    """Directed skip-gram co-occurrence counts over per-key ORDERED
    sequences — "event a is followed by event b within ``window``
    steps" — the training-pair generator under item2vec/session-based
    recommenders and the input statistic for next-event features.
    :func:`cooccurrence_pmi` counts bag-of-words pairs per document;
    this counts ordered pairs along the sequence axis.

    Shape: the ``cross_correlation`` lead-family device — one window
    partitioning (``key_col`` ordered by ``order_cols``) shared by all
    ``window`` lead projections of the same scan, unioned, then ONE
    map-side-combinable count keyed ``(center, context)``. No
    self-join of the sequence, no row_number materialization; fan-out
    is exactly ``window`` per input row regardless of key skew, so a
    Zipf-hot key costs ``window`` x its row count, never quadratic.

    Output: ``(center, context, n_pairs)`` with BIGINT counts.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    parts = [
        df.select(
            F.col(token_col).alias("center"),
            F.lead(token_col, i).over(w).alias("context"),
        )
        for i in range(1, window + 1)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.filter(F.col("context").isNotNull())
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
