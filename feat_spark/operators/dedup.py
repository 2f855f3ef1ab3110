"""Deduplication operators for training-data pipelines.

Four families, each with its 100 TB story:

* **exact** — one hash-groupBy. Map-side partial agg makes the shuffle
  carry only (hash, rep_id, count) pairs, not documents.
* **n-gram Jaccard** — exact near-dup over distinct word shingles.
  The self-join explodes shingles; at scale you NEVER run it raw —
  it is the *verifier* behind MinHash-LSH blocking (below). Kept
  callable standalone for small frames / oracle parity.
* **MinHash + LSH** — the scale path: k portable hash-mins per doc
  (one narrow map), band signatures, candidate pairs from an
  equi-join on (band, band_hash) — shuffle proportional to docs x
  bands, not docs² — then exact-Jaccard verification of candidates
  only.
* **SimHash** — 32-bit per-doc fingerprint; Hamming-adjacent buckets
  find near-dups of *token distribution* (complements shingle
  Jaccard).

Embedding-cosine near-dup lives in ``feat_spark.operators.similarity``.

All hashes are ``md5``-derived (portable bit-for-bit to the DuckDB
oracle — see functions/text.py); the engine's internal fast hash
remains xxhash64. The reference's contribution here is the *discipline*:
stable hash ⇒ stable identity (/root/reference/src/feat.erl:459-461),
order-canonicalization before compare (feat.erl:128-141) — exactly what
shingle-set dedup does at corpus scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import md5_long32, word_shingles


def exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Exact duplicate groups: md5 over the (concatenated) content
    columns, keep the smallest id as representative.

    Returns ``(content_hash, rep_id, n_dups)`` — join back on the hash
    to filter the corpus. One shuffle, partial-agg friendly.
    """
    h = F.md5(F.concat_ws("", *[F.col(c) for c in cols]))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).cast("long").alias("rep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(text_col, n)).alias("__sh"),
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over distinct word shingles.

    With ``candidates`` (a ``(id_a, id_b)`` frame from LSH) only those
    pairs are scored — the scale path. Without, all co-shingled pairs
    are scored (small inputs / oracle only: the shingle self-join is
    O(sum df²) in the worst case).

    Output: ``(id_a, id_b, jaccard)`` with ``id_a < id_b``,
    ``jaccard >= threshold``, jaccard rounded to 6dp for cross-engine
    comparability.
    """
    sh = _shingle_rows(df, id_col, text_col, n)
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.__sh") == F.col("b.__sh")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    if candidates is not None:
        inter = inter.join(
            F.broadcast(candidates.select("id_a", "id_b").distinct()),
            on=["id_a", "id_b"],
            how="left_semi",
        )
    sa = sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "__na")
    sb = sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "__nb")
    jac = F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    n: int = 3,
) -> DataFrame:
    """k MinHash values per document over its distinct n-word shingles.

    ``sig_i = min over shingles of h32(i || ':' || shingle)`` — the
    portable md5-derived hash, so the DuckDB oracle reproduces every
    signature bit-for-bit. Narrow map only (array_min over a transform)
    — no explode, no shuffle.
    """
    sh = word_shingles(text_col, n)

    def _hasher(i: int):
        # NB: single-arg lambda on purpose — a two-arg lambda would be
        # interpreted by transform() as (element, index).
        return lambda s: md5_long32(F.concat_ws(":", F.lit(str(i)), s))

    cols = [F.col(id_col)]
    for i in range(k):
        cols.append(F.array_min(F.transform(sh, _hasher(i))).alias(f"sig_{i}"))
    return df.select(*cols)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split the k signatures into ``bands`` bands of
    ``k/bands`` rows; docs agreeing on ALL rows of any band become a
    candidate pair. Shuffle = docs x bands rows keyed by a 128-bit
    band hash — the only join in the pipeline, and it is an equi-join
    Catalyst can plan (SMJ / shuffled hash / AQE skew-split).
    """
    rows_per_band = k // bands
    banded = sigs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ":",
                                *[
                                    F.col(f"sig_{b * rows_per_band + r}").cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("__id", "bh.band", "bh.bhash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The full scale pipeline: MinHash -> LSH candidates -> exact
    Jaccard verification of candidates only."""
    sigs = minhash_signatures(df, id_col, text_col, k, n)
    cand = lsh_candidate_pairs(sigs, id_col, k, bands)
    return shingle_jaccard_pairs(df, id_col, text_col, n, threshold, candidates=cand)


def simhash32(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """32-bit SimHash over words: per bit j, sum +1/-1 votes of every
    word occurrence's hash bit j; fingerprint sets bit j when the vote
    is non-negative.

    Explode-free: per row, transform words x bits inside array exprs,
    then fold. Output ``(id, simhash:long)``.
    """
    ws = F.split(F.trim(F.col(text_col)), "\\s+")
    hashed = F.transform(ws, lambda w: md5_long32(w))

    def bit_vote(j: int):
        votes = F.transform(
            hashed,
            lambda h: F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        total = F.aggregate(votes, F.lit(0), lambda acc, v: acc + v)
        return F.when(total >= 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))

    fp = bit_vote(0)
    for j in range(1, 32):
        fp = fp + bit_vote(j)
    return df.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Blocking: split the 32 bits into ``max_hamming+1`` chunks — any pair
    within the distance agrees exactly on >=1 chunk (pigeonhole), so an
    equi-join per chunk finds all pairs without an O(n²) cross join.
    """
    chunks = max_hamming + 1
    width = 32 // chunks
    exploded = sims.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("__id", "simhash", "ck.chunk", "ck.key")
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.simhash").alias("__ha"),
            F.col("b.simhash").alias("__hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return pairs.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
