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


def ngram_doc_freq(
    df: DataFrame,
    n: int = 2,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level n-gram document frequencies — the boilerplate-mining
    primitive (an n-gram appearing in many documents is template text:
    headers, disclaimers, navigation chrome; its output feeds manual
    blocklists or the line-level cleaners of a curation pass).

    ``(ngram, n_docs, doc_share)`` for every n-word gram appearing in
    at least ``min_docs`` DISTINCT documents (per-doc dedup via
    ``word_shingles``, so a gram repeated inside one doc counts once).
    One explode + one partial-agg group-by keyed by the gram — the
    natural blocking key; a Zipf-hot gram is bounded by map-side
    combine, never a single task.
    """
    from feat_spark.functions.text import word_shingles

    total = df.select(id_col).distinct().count()
    grams = df.select(
        F.col(id_col).alias("__id"), F.explode(word_shingles(text_col, n)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "ngram", "n_docs", F.round(F.col("n_docs") / total, 6).alias("doc_share")
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram language-model log-probability — the
    CCNet-style perplexity quality filter: documents whose word
    transitions are unusual for the corpus score low and get reviewed
    or dropped.

    Model: corpus MLE bigram probabilities ``p(w2|w1) = C(w1 w2) /
    C(w1 ·)`` (no smoothing needed when scoring the training corpus —
    every scored bigram was counted). Output ``(doc_id, n_bigrams,
    avg_logp)`` with ``avg_logp = round(sum ln p / n, 6)``; docs with
    fewer than two words get NULL.

    Determinism discipline: the per-document sum of float log-probs is
    order-dependent, so it is computed as a fold over the doc's bigram
    TYPES sorted lexicographically (collect -> array_sort -> aggregate)
    — the same left-to-right order an external engine reproduces —
    never a partial-agg float sum. Shapes: two gram-keyed partial-agg
    group-bys for the model (map-side combinable, the Zipf-hot gram is
    bounded), one gram-keyed join to attach log-probs, one per-doc
    fold. All scale-safe; per-doc type lists are document-length
    bounded.
    """
    from feat_spark.functions.text import raw_word_ngrams

    grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(raw_word_ngrams(text_col, 2)).alias("bg"),
    ).withColumn("w1", F.split(F.col("bg"), " ")[0])
    per_doc = grams.groupBy("__id", "bg", "w1").agg(
        F.count(F.lit(1)).alias("k")
    )
    c_bg = per_doc.groupBy("bg").agg(F.sum("k").alias("c2"))
    c_w1 = per_doc.groupBy("w1").agg(F.sum("k").alias("c1"))
    scored = (
        per_doc.join(c_bg, "bg")
        .join(c_w1, "w1")
        .withColumn("lp", F.col("k") * F.log(F.col("c2") / F.col("c1")))
    )
    folded = scored.groupBy("__id").agg(
        F.sum("k").alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bg", "lp"))),
                lambda s: s["lp"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("__sum_lp"),
    )
    out = folded.select(
        F.col("__id").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(F.col("__sum_lp") / F.col("n_bigrams"), 6).alias("avg_logp"),
    )
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(out, id_col, "left")


def bm25_topk(
    df: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, word, bm25, rank)`` — top ``k`` terms per document
    by Okapi BM25 (Robertson et al.), the retrieval-grade salience
    score :func:`tfidf_topk` approximates: term frequency saturates at
    ``k1`` and long documents are penalized through the ``b``-weighted
    length norm, so boilerplate-heavy long docs stop dominating::

        idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))      (Lucene form,
                                                          never negative)
        s(d, t) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Same relational shape as :func:`tfidf_topk` — one explode, two
    partial-agg group-bys (tf; df), one word-keyed equi-join, one
    per-doc top-k window — so the Zipf-hot word is bounded by map-side
    combine and the plan survives a 100x scale-up unchanged. The doc
    length ``dl = Σ tf`` and the corpus stats (N docs, avg dl) are
    DERIVED FROM the tf frame (no second scan of the input); N/avgdl
    enter as driver-side scalars, keeping the plan free of a 1-row
    broadcast-nested-loop join. N counts documents with at least one
    word — empty docs have no terms to rank and don't dilute avgdl.

    Ties break by word ascending; every float op is replayed in the
    same order by the oracle, so the rounded score is bit-portable.
    """
    w = df.select(F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # tf is consumed three times (df-counts, corpus stats, the join) —
    # deliberately NOT .cache()d here: marking this subtree in the
    # session CacheManager makes Spark silently substitute it into any
    # OTHER query whose tf fragment is structurally identical (tfidf's
    # plan changed shape exactly this way), a construction-time side
    # effect no operator should have. Callers that loop bm25 over one
    # corpus can cache the input df themselves, which is scoped and
    # explicit.
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_docs, sum_dl = tf.agg(
        F.countDistinct("doc_id"), F.sum("tf")
    ).first()
    avgdl = sum_dl / n_docs  # exact ints -> one correctly-rounded div
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = (
        F.col("tf") * (F.lit(float(k1)) + 1.0)
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (F.lit(1.0) - F.lit(float(b)) + F.lit(float(b)) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        tf.join(dfreq, "word")
        .join(dl, "doc_id")
        .withColumn("bm25", F.round(idf * norm, 6))
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("bm25").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "word", "bm25", "rank")
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """One merge step of byte-pair-encoding tokenizer training: count
    every adjacent symbol pair inside words, corpus-wide, and return
    the top-k merge candidates — the inner loop of Sennrich et al.
    (ACL 2016), the operator a tokenizer-training pipeline runs
    hundreds of times over the full corpus.

    Relational shape: explode words (weighted by their occurrence
    count — aggregate words FIRST so a word repeated a million times
    is one row with weight 10^6, the standard BPE trick), generate the
    length-1 character-pair array per distinct word with ``transform``
    over ``sequence`` (pure JVM, no UDF), explode, and one weighted
    partial-agg sum keyed by pair. Zipf-hot pairs ("e " "th") are
    bounded by map-side combine; the distinct-word frame is vocabulary
    -sized, not corpus-sized, so later merge steps iterate over a
    frame ~10^6 rows regardless of corpus bytes. Top-k via
    orderBy+limit = TakeOrdered on integer counts, ties broken by pair
    text for cross-engine determinism.
    """
    wc = (
        df.select(F.explode(words(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    pairs = wc.select(
        F.explode(
            F.when(
                F.length("__w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("__w") - 1),
                    lambda i: F.col("__w").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        F.col("__c"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("__c").alias("count"))
        .orderBy(F.col("count").desc(), F.col("pair"))
        .limit(k)
    )


def build_inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """Positional inverted index: one row per word with its posting
    list ``[(doc_id, positions[]), ...]`` sorted by doc id — the
    retrieval structure a search/RAG pipeline builds over the corpus
    (BM25 scoring and phrase queries both read it).

    Shape: explode (word, position) pairs once; one partial agg packs
    per-(word, doc) position arrays (``array_sort(collect_list)`` —
    positions are unique per doc so the sort is total); one more agg
    packs the doc-sorted posting list per word. Both aggregations key
    on the word — the natural blocking key; a stopword's giant posting
    list is ONE row built by map-side-combinable collect over its
    (word, doc) groups, and the ``max_df_ratio`` gate (default off)
    drops it before materialization the way real indexes do. Driver
    holds only N (one count) for that gate. Output is
    vocabulary-sized.

    Output: ``(word, df, n_postings, postings:array<struct<doc_id,
    positions:array<int>>>)``.
    """
    w = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(words(text_col)).alias("__pos", "__w"),
    )
    per_doc = w.groupBy("__w", "__id").agg(
        F.array_sort(F.collect_list(F.col("__pos").cast("int"))).alias("__positions")
    )
    idx = per_doc.groupBy("__w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(F.size("__positions")).alias("n_postings"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__id").alias("doc_id"),
                    F.col("__positions").alias("positions"),
                )
            )
        ).alias("postings"),
    )
    if max_df_ratio < 1.0:
        n_docs = df.select(F.countDistinct(id_col)).collect()[0][0]
        idx = idx.filter(F.col("df") <= int(max_df_ratio * n_docs))
    return idx.filter(F.col("df") >= min_df).select(
        F.col("__w").alias("word"), "df", "n_postings", "postings"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topn: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of multiple
    per-query rankings into one list: ``rrf(d) = sum_lists 1/(k +
    rank_i(d))`` — the standard score-free way to merge heterogeneous
    retrievers (BM25 + embedding kNN) whose raw scores are not
    comparable. A document absent from a list contributes nothing.

    Shape: union the (already bounded, top-k-per-query) input lists
    with a source tag, then ONE partial-agg keyed by (query, doc).
    The per-doc fold over lists is sorted by source index (2-3 terms,
    but 3+ double additions are order-sensitive — same sorted-fold
    device as mutual_information) so the fused score is bit-stable.
    Nothing scales with corpus size: RRF only ever sees the top-k
    lists the retrievers emit, per query.

    Output: ``(query, doc, n_lists, rrf, fused_rank)``; ``fused_rank``
    is a per-query row_number ordered by (rrf desc, doc) — ties break
    deterministically on doc id; ``topn`` keeps the head if set.
    RRF scores rounded 9dp (they are sums of small reciprocals).
    """
    tagged = []
    for i, r in enumerate(rankings):
        tagged.append(
            r.select(
                F.col(query_col).alias("query"),
                F.col(id_col).alias("doc"),
                F.lit(i).alias("__src"),
                (
                    F.lit(1.0)
                    / (F.lit(float(k)) + F.col(rank_col).cast("double"))
                ).alias("__r"),
            )
        )
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy("query", "doc").agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__src", "__r"))),
                lambda s: s["__r"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("__rrf"),
    )
    w = Window.partitionBy("query").orderBy(F.desc("__rrf"), F.asc("doc"))
    out = fused.select(
        "query",
        "doc",
        "n_lists",
        F.round("__rrf", 9).alias("rrf"),
        F.row_number().over(w).cast("long").alias("fused_rank"),
    )
    if topn is not None:
        out = out.filter(F.col("fused_rank") <= topn)
    return out


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact positional phrase query — which documents contain the
    words of ``phrase`` CONSECUTIVELY, where, and how often: the
    retrieval step an inverted index with positions
    (:func:`build_inverted_index`) exists to answer, expressed
    directly over the corpus so the scan prunes to the phrase's own
    words before anything shuffles.

    Plan: one posexplode pass filtered to the phrase's word set (the
    filter sits under the explode's projection — the corpus never
    materializes its full positional index for a query), then the
    classic anchor trick: occurrence of term i at position p
    contributes anchor ``p - i``, and a phrase match is an anchor
    shared by ALL terms — (k-1) equi-joins on (doc, anchor), each side
    bounded by the df of its term, so the whole query costs what the
    RAREST term costs (Zipf-safe: a stopword in the phrase inflates
    one join side, never a cross product). All-integer outputs.

    Output: ``(id_col, n_matches, first_pos)`` for matching docs only;
    ``first_pos`` is the 0-based token index of the first match.
    """
    terms = phrase.split()
    if not terms:
        raise ValueError("empty phrase")
    w = df.select(
        F.col(id_col), F.posexplode(words(text_col)).alias("__p", "__w")
    ).filter(F.col("__w").isin(list(set(terms))))
    j = None
    for i, t in enumerate(terms):
        f = w.filter(F.col("__w") == t).select(
            id_col, (F.col("__p").cast("long") - F.lit(i)).alias("__anchor")
        )
        j = f if j is None else j.join(f, [id_col, "__anchor"])
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("__anchor").alias("first_pos"),
    )


def ndcg_at_k(
    ranked: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    item_col: str = "item",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k per query — the ranking-quality readout for retrieval /
    recommendation eval: ``DCG = sum_{i<=k} rel_i / log2(i+1)``
    against the ideal ordering's ``IDCG``, so :func:`rrf_fuse` output
    (or any ranked list) can be scored against ground-truth relevance.

    ``ranked`` carries (query, item, 1-based rank); ``truth`` carries
    (query, item, integer relevance). Items missing from truth gain 0;
    truth items missing from the ranking only lower NDCG through IDCG.
    Queries must appear in both frames (inner join; a query with no
    truth rows has no defined ideal).

    Determinism: log2 is computed as ``ln(r+1)/ln(2)`` IN BOTH ENGINES
    (the behavior_entropy ln-parity device), each term does one
    division, and both per-query sums run as sorted folds over
    rank-ordered (rel-ordered for IDCG) arrays of <= k elements — the
    ``F.aggregate``/``list_reduce`` bit-parity twin. Per-query state
    is <= k structs: bounded, never a giant collect.

    Output: ``(query, dcg, idcg, ndcg)``, 6dp; NULL ndcg when
    IDCG = 0 (all-zero relevance).
    """
    ln2 = F.log(F.lit(2.0))
    r = ranked.filter(F.col(rank_col) <= k).alias("r")
    t = truth.alias("t")
    gains = r.join(
        t,
        (F.col(f"r.{query_col}") == F.col(f"t.{query_col}"))
        & (F.col(f"r.{item_col}") == F.col(f"t.{item_col}")),
        "left",
    ).select(
        F.col(f"r.{query_col}").alias("query"),
        F.col(f"r.{rank_col}").alias("pos"),
        (
            F.coalesce(F.col(f"t.{rel_col}"), F.lit(0)).cast("double")
            / (F.log(F.col(f"r.{rank_col}") + F.lit(1.0)) / ln2)
        ).alias("term"),
    )
    dcg = gains.groupBy("query").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("dcg")
    )
    wi = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(item_col).asc()
    )
    ideal = (
        truth.withColumn("pos", F.row_number().over(wi))
        .filter(F.col("pos") <= k)
        .select(
            F.col(query_col).alias("query"),
            "pos",
            (
                F.col(rel_col).cast("double")
                / (F.log(F.col("pos") + F.lit(1.0)) / ln2)
            ).alias("term"),
        )
        .groupBy("query")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ).alias("idcg")
        )
    )
    return dcg.join(ideal, "query").select(
        "query",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.when(
            F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
        ).alias("ndcg"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary — the OLS slope of
    ``ln(freq)`` against ``ln(rank)`` for the top ``top_n`` words: a
    healthy natural-language corpus sits near -1; template spam,
    boilerplate floods, and synthetic junk bend it — making this a
    one-number corpus-quality monitor next to the per-document
    heuristics in ``functions/text.py``.

    Shape: one word count (partial-agg), TakeOrdered top_n by
    ``(freq DESC, word ASC)`` — deterministic and vocabulary-scale,
    the build_vocab rank discipline — then FOUR sorted folds over the
    same rank-ordered array of <= top_n (ln(rank), ln(freq)) pairs
    (bounded collect; the behavior_entropy ln-parity device), and the
    OLS closed form with a fixed handful of divisions.

    Output: one row ``(n_words, slope, intercept)``, 6dp.
    """
    counts = (
        df.select(F.explode(words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.col("f").desc(), F.col("w").asc())
        .limit(top_n)
    )
    wr = Window.orderBy(F.col("f").desc(), F.col("w").asc())
    ranked = counts.withColumn("r", F.row_number().over(wr)).select(
        "r",
        F.log(F.col("r").cast("double")).alias("__x"),
        F.log(F.col("f").cast("double")).alias("__y"),
    )

    def fold(term):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("r", term.alias("__t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["__t"],
        )

    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_words"),
        fold(F.col("__x")).alias("sx"),
        fold(F.col("__y")).alias("sy"),
        fold(F.col("__x") * F.col("__y")).alias("sxy"),
        fold(F.col("__x") * F.col("__x")).alias("sxx"),
    )
    n = F.col("n_words")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "n_words",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / n, 6
        ).alias("intercept"),
    )


def rbo_rankings(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    depth: int = 5,
) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between two per-query
    rankings, truncated at ``depth`` with persistence p = 1/2 — "how
    much do these two retrievers / scorers agree, weighted toward the
    top": the ranking-comparison metric beside :func:`ndcg_at_k`
    (NDCG scores ONE ranking against relevance; RBO compares TWO
    rankings against each other — retriever A/B tests, feature-drift
    checks on recommendation lists).

    p = 1/2 on purpose — the exactness device: every weight is a
    dyadic rational, so with D = 5 the truncated, renormalized score
    ``RBO = (sum_d X_d/(d·2^d)) / (1 − 2^−D)`` scales by 1920 into
    EXACT INTEGERS (960·X₁ + 240·X₂ + 80·X₃ + 30·X₄ + 12·X₅) and
    closes with ONE division by 1860 — no float accumulation, no
    geometric-series rounding. X_d = |top-d(A) ∩ top-d(B)| comes from
    one (query, item) equi-join + a conditional agg over the D
    depths; identical rankings score exactly 1.0.

    Inputs: ``(query_id, item, rank)`` each, rank 1-based and unique
    per query. Output: ``(query_id, overlap_at_depth, rbo)``.
    """
    if depth != 5:
        raise ValueError("the dyadic scale table is built for depth=5")
    a = ranked_a.select("query_id", "item", F.col("rank").alias("__ra"))
    b = ranked_b.select("query_id", "item", F.col("rank").alias("__rb"))
    j = a.join(b, ["query_id", "item"]).filter(
        (F.col("__ra") <= depth) & (F.col("__rb") <= depth)
    )
    scale = {1: 960, 2: 240, 3: 80, 4: 30, 5: 12}
    mx = F.greatest(F.col("__ra"), F.col("__rb"))
    # each intersecting pair contributes to every depth d >= max(ra,rb):
    # sum_d>=m scale_d precomputed per m
    tail = {m: sum(scale[d] for d in range(m, depth + 1)) for m in scale}
    contrib = F.when(mx == 1, F.lit(tail[1]))
    for m in range(2, depth + 1):
        contrib = contrib.when(mx == m, F.lit(tail[m]))
    g = j.groupBy("query_id").agg(
        F.sum((mx <= depth).cast("long")).alias("overlap_at_depth"),
        F.sum(contrib.cast("long")).alias("__s"),
    )
    return g.select(
        "query_id",
        "overlap_at_depth",
        F.round(F.col("__s").cast("double") / F.lit(1860.0), 9).alias("rbo"),
    )


def map_at_k(
    ranked: DataFrame,
    truth: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Average precision at k per query — the order-sensitive
    retrieval metric beside :func:`ndcg_at_k` (graded gain) and
    :func:`rbo_rankings` (ranking-vs-ranking): AP rewards putting the
    relevant items EARLY, as the mean of precision@r over the ranks r
    where a relevant item actually appeared, normalized by
    ``min(k, n_relevant)``.

    Exactness device — multiply through by lcm(1..k): every
    precision@r is ``hits_so_far / r`` with r <= k, so scaling by
    L = lcm(1..k) (60 for k=5) makes each term the exact integer
    ``hits_so_far * (L / r)``; the per-query sum is an exact long and
    AP closes with ONE division by ``L * min(k, n_rel)``. No float
    folds anywhere. Hit ranks come from one equi-join (query, item)
    and the running hit count from a per-query window over <= k rows.

    Inputs: ``ranked(query_id, item, rank)`` (1-based, unique per
    query), ``truth(query_id, item)``. Queries with no relevant items
    are excluded (AP undefined); queries whose relevant items all
    miss the top-k score 0.0.

    Output: ``(query_id, n_rel, n_hits, ap)``.
    """
    import math

    L = math.lcm(*range(1, k + 1))
    t = truth.select("query_id", "item").distinct()
    n_rel = t.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (
        ranked.filter(F.col("rank") <= k)
        .join(t, ["query_id", "item"])
        .select("query_id", "rank")
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("rank").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = hits.withColumn("__cum", F.count(F.lit(1)).over(w)).withColumn(
        "__term",
        F.col("__cum")
        * F.element_at(
            F.array(*[F.lit(L // r) for r in range(1, k + 1)]), F.col("rank").cast("int")
        ),
    )
    per = terms.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum("__term").alias("__s"),
    )
    out = n_rel.join(per, "query_id", "left")
    denom = F.lit(L) * F.least(F.lit(k), F.col("n_rel"))
    return out.select(
        "query_id",
        "n_rel",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce(F.col("__s"), F.lit(0)).cast("double")
            / denom.cast("double"),
            9,
        ).alias("ap"),
    )


def mrr_at_k(
    ranked: DataFrame,
    truth: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Reciprocal rank at k per query — "how deep does the user dig
    before the first relevant hit": RR = 1/rank of the FIRST relevant
    item in the top-k (0 if none), plus the success@k flag. The
    first-hit companion of :func:`map_at_k` (AP scores the whole
    list; navigational queries only care about the first hit).

    Exactness: RR is ONE IEEE division of small integers
    (``1/rank``), deterministic in any engine. First hit = min rank
    over the (query, item) equi-join — no window needed. The query
    spine re-derives from ``truth`` through an aliased projection
    (both sides descend from the same frame — the classic self-join
    ambiguity otherwise mis-resolves columns).

    Output: ``(query_id, first_hit_rank, success_at_k, rr)`` for
    every query in ``truth`` (missed queries carry NULL rank, false,
    0.0).
    """
    t = truth.select("query_id", "item").distinct()
    queries_f = t.groupBy("query_id").agg(F.count(F.lit(1)).alias("__nrel"))
    hit = (
        ranked.filter(F.col("rank") <= k)
        .join(t, ["query_id", "item"])
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_hit_rank"))
    )
    out = queries_f.join(hit, "query_id", "left").select(
        "query_id", "first_hit_rank"
    )
    return out.select(
        "query_id",
        "first_hit_rank",
        F.col("first_hit_rank").isNotNull().alias("success_at_k"),
        F.coalesce(
            F.round(
                F.lit(1.0) / F.col("first_hit_rank").cast("double"), 9
            ),
            F.lit(0.0),
        ).alias("rr"),
    )
