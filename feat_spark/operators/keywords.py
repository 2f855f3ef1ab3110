"""TF-IDF keyword extraction — per-document top-k salient terms.

Fully relational: explode words once, two partial-agg group-bys
(term frequency per (doc, word); document frequency per word), one
word-keyed equi-join, one per-doc window. Every aggregation is
map-side-combinable and the join key (word) is the natural blocking
key, so the plan survives a 100x scale-up unchanged; a Zipf-hot word
("the") is bounded by the partial aggregation, never a single task.

The corpus size N enters as a driver-side scalar (one count) — a
global constant, the same class of tiny driver read as a checkpoint
manifest; inlining it keeps the plan free of the 1-row
broadcast-nested-loop join a cross-join would plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import words


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, word, tfidf, rank)`` — top ``k`` terms per document
    by ``tf * (ln((N+1)/(df+1)) + 1)`` (smoothed idf, sklearn-style).
    Ties break by word ascending, so the result is deterministic and
    an external engine reproduces it bit-for-bit (double math + round).
    """
    w = df.select(F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(id_col).distinct().count()
    scored = tf.join(dfreq, "word").withColumn(
        "tfidf",
        F.round(
            F.col("tf") * (F.log((F.lit(n) + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
        ),
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "word", "tfidf", "rank")
    )
