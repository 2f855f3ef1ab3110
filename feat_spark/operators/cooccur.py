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


def basket_rules(
    df: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    per_basket: int = 32,
) -> DataFrame:
    """Market-basket association rules for item pairs — support,
    directional confidence, and lift: the co-purchase statistic under
    "customers who bought a also bought b". Same pair-generation
    algebra as :func:`cooccurrence_pmi` (that one reads out PMI over
    word-document bags; this reads out the rules triple over
    item-basket bags) with the same scale guarantees: baskets are
    capped at ``per_basket`` distinct items FIRST (item ascending —
    deterministic), the pair generator is a self-equi-join on the
    basket key (per-key fan-out <= per_basket^2, never cartesian),
    and a support floor prunes the tail before any ratio is computed.

    Exactness: supports are BIGINT basket counts; ``conf_ab =
    n_ab/n_a``, ``conf_ba = n_ab/n_b`` and ``lift = n_ab*N/(n_a*n_b)``
    each do ONE integer-operand division, round 6.

    Output: ``(item_a, item_b, n_ab, n_a, n_b, conf_ab, conf_ba,
    lift)`` with ``item_a < item_b``.
    """
    n_baskets = df.select(basket_col).distinct().count()
    items = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
    ).distinct()
    w = Window.partitionBy("bk").orderBy(F.col("item").asc())
    capped = (
        items.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_basket)
        .select("bk", "item")
    )
    supp = capped.groupBy("item").agg(F.count(F.lit(1)).alias("n_i"))
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "bk")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    return (
        pairs.join(
            supp.select(F.col("item").alias("item_a"), F.col("n_i").alias("n_a")),
            "item_a",
        )
        .join(
            supp.select(F.col("item").alias("item_b"), F.col("n_i").alias("n_b")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_ab"),
            F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_ba"),
            F.round(
                (F.col("n_ab") * F.lit(int(n_baskets)))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def segment_overlap(
    df: DataFrame,
    entity_col: str,
    segment_col: str,
    max_segments_per_entity: int | None = None,
) -> DataFrame:
    """Pairwise audience overlap between segments — shared-entity
    counts and Jaccard for every segment pair with at least one common
    member: the "how much do these cohorts overlap" readout under
    audience planning, label-taxonomy audits, and redundant-segment
    pruning.

    Scale shape (the :func:`basket_rules` device): reduce to DISTINCT
    (entity, segment) grain first, then ONE self-join keyed by the
    ENTITY — fan-out per entity is (segments-per-entity choose 2),
    bounded by the schema (segments are a taxonomy, not data), with
    ``max_segments_per_entity`` as the optional hard cap for
    pathological entities (capped entities are DROPPED from pair
    counting, the honest form — a partial pair set would silently
    bias Jaccard). Segment sizes ride a second tiny agg; the final
    join is segment-pair-sized (dimension-scale).

    Jaccard = common / (n_a + n_b - common): integer operands, one
    double division, 6dp — bit-replayable.
    """
    grain = df.select(
        F.col(entity_col).alias("e"), F.col(segment_col).alias("s")
    ).distinct()
    if max_segments_per_entity is not None:
        counts = grain.groupBy("e").agg(F.count(F.lit(1)).alias("__n"))
        keep = counts.filter(
            F.col("__n") <= max_segments_per_entity
        ).select("e")
        grain = grain.join(keep, "e", "left_semi")
    sizes = grain.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    l = grain.select("e", F.col("s").alias("seg_a"))
    r = grain.select("e", F.col("s").alias("seg_b"))
    common = (
        l.join(r, "e")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            sizes.select(F.col("s").alias("seg_a"), F.col("n").alias("n_a")),
            "seg_a",
        )
        .join(
            sizes.select(F.col("s").alias("seg_b"), F.col("n").alias("n_b")),
            "seg_b",
        )
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_pairs: int = 2,
) -> DataFrame:
    """Item–item cosine similarity with per-item top-k — the classic
    neighborhood collaborative-filtering index ("customers who bought
    X also bought Y"), and the co-purchase complement of
    :func:`cooccurrence_pmi` (PMI normalizes by independence; cosine
    by popularity — the recsys convention, since sqrt damping keeps
    blockbuster items from dominating every neighbor list).

    ``cos(a,b) = n_ab / sqrt(n_a * n_b)`` over binary basket
    incidence: ``n_ab`` = baskets containing both, ``n_a`` = baskets
    containing a. The pair generator is a self-EQUI-join on the basket
    key after within-basket dedup, so fan-out is bounded by the square
    of the basket size (single digits in commerce; cap upstream for
    pathological baskets — the cooccurrence_pmi device), never by the
    catalog. Counts are one map-side-combinable agg on the pair key;
    the top-k window partitions by item — all shuffles are key-hash,
    no cartesian anywhere, same plan at 10^3 and 10^9 baskets.

    Determinism: counts are BIGINTs, cosine is one integer-product
    sqrt + division (identical IEEE in any engine), rounded 9dp at the
    edge; the top-k order is (cosine desc, n_ab desc, neighbor asc) —
    a full deterministic key.

    Output: ``(item, neighbor, n_pairs, cosine, rank)``, both
    directions of every surviving pair (each item gets its own list).
    """
    g = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_item = g.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    a = g.alias("a")
    b = g.alias("b")
    pair = (
        a.join(b, "__b")
        .filter(F.col("a.__i") < F.col("b.__i"))
        .groupBy(
            F.col("a.__i").alias("__ia"), F.col("b.__i").alias("__ib")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .filter(F.col("n_pairs") >= int(min_pairs))
    )
    both = pair.unionByName(
        pair.select(
            F.col("__ib").alias("__ia"),
            F.col("__ia").alias("__ib"),
            "n_pairs",
        )
    )
    scored = (
        both.join(n_item.withColumnRenamed("__i", "__ia"), "__ia")
        .withColumnRenamed("__n", "__na")
        .join(n_item.withColumnRenamed("__i", "__ib"), "__ib")
        .withColumnRenamed("__n", "__nb")
        .withColumn(
            "cosine",
            F.col("n_pairs").cast("double")
            / F.sqrt((F.col("__na") * F.col("__nb")).cast("double")),
        )
    )
    w = Window.partitionBy("__ia").orderBy(
        F.col("cosine").desc(), F.col("n_pairs").desc(), F.col("__ib")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("__ia").alias("item"),
            F.col("__ib").alias("neighbor"),
            "n_pairs",
            F.round("cosine", 9).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
