"""Corpus composition + mixture re-weighting — the "data mixing" stage
of a training-data pipeline.

Two primitives:

* ``corpus_mix`` — the per-stratum composition report (docs, tokens,
  token share) a training run publishes before consuming a corpus: one
  hash aggregate over the stratum columns, a driver-side total, shares
  as exact decimal ratios. 100 TB: a partial-agg group-by on a
  low-cardinality key — nothing to optimize.
* ``mixture_sample`` — downsample strata to hit TARGET mixture weights
  without upsampling: with stratum sizes c_s and target weights w_s,
  the largest corpus exactly at the target mixture keeps
  ``T = min_s(c_s / w_s)`` rows total and ``keep_s = w_s * T`` per
  stratum. Rates are fixed as integer basis points and applied through
  the same portable md5 hash gate as ``operators/sampling.py`` — the
  sampled SET is deterministic, layout-independent, and replayable by
  an external engine (the driver gate's oracle recomputes rates AND
  membership in SQL). The stratum sizes come from one small aggregate
  collected to the driver (|strata| rows — broadcast-small by
  construction); the data pass is a single hash-gate filter that
  pushes down to the scan.

Upsampling (epochs over rare strata) is a training-loop concern, not a
corpus transform — this operator only ever drops rows, which keeps it
idempotent and replayable.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import md5_long32, words


def corpus_mix(
    df: DataFrame,
    strata: str | Sequence[str] = ("lang", "source"),
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Per-stratum composition: ``(*strata, n_docs, n_tokens,
    token_share)`` with ``token_share`` rounded to 6dp of the corpus
    total."""
    strata = [strata] if isinstance(strata, str) else list(strata)
    toks = (F.col(token_col) if token_col else F.size(words(text_col))).cast("long")
    per = df.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    # global-window total over the ALREADY-AGGREGATED frame (|strata|
    # rows) — the single-partition window is over a handful of rows,
    # never the corpus
    total = F.sum("n_tokens").over(Window.partitionBy())
    return per.select(
        *strata,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / total, 6).alias("token_share"),
    )


def mixture_rates(
    counts: Mapping[tuple, int], targets: Mapping[tuple, float]
) -> dict[tuple, int]:
    """Per-stratum keep rates in basis points (0..10000) achieving the
    target mixture at maximum size without upsampling. Pure driver-side
    arithmetic on the tiny stratum-count table — exposed for tests and
    for replaying the computation in an external engine."""
    missing = set(targets) - set(counts)
    if missing:
        raise ValueError(
            f"targets name absent strata: {sorted(missing, key=repr)}"
        )
    # a zero-count stratum with POSITIVE weight forces t_max = 0 and
    # every rate to zero — fail loudly here too (not only in
    # mixture_sample) so direct callers can't get the silent collapse.
    # Weight-0 strata are an explicit exclude and are exempt.
    empty = sorted(
        (k for k, w in targets.items() if w > 0 and counts.get(k, 0) == 0),
        key=repr,
    )
    if empty:
        raise ValueError(f"positive-weight strata have zero rows: {empty}")
    wsum = float(sum(targets.values()))
    norm = {k: v / wsum for k, v in targets.items()}
    t_max = min(counts[s] / w for s, w in norm.items() if w > 0)
    rates = {}
    for s, w in norm.items():
        keep = w * t_max
        # floor, not round: no .5-tie ambiguity, so an external engine
        # (DuckDB oracle) reproduces every basis point bit-for-bit
        rates[s] = min(10000, int(10000 * keep / counts[s])) if counts[s] else 0
    return rates


def mixture_sample(
    df: DataFrame,
    targets: Mapping,
    strata: str | Sequence[str] = "source",
    key: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Hash-gated downsample to the target stratum mixture.

    ``targets``: {stratum_value(s): weight}. Strata absent from
    ``targets`` are DROPPED (explicit inclusion — a mixture spec is a
    whitelist). Rows kept per stratum: the deterministic md5 gate
    ``hash(salt:key) % 10000 < rate_bp`` — so re-running on re-
    partitioned/re-ordered data returns the identical set.
    """
    strata = [strata] if isinstance(strata, str) else list(strata)
    cnt_rows = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("n")).collect()
    counts = {tuple(r[s] for s in strata): r["n"] for r in cnt_rows}
    tkeys = {k if isinstance(k, tuple) else (k,): v for k, v in targets.items()}
    # a POSITIVE-weight target stratum absent from the data means
    # t_max = 0 and EVERY rate collapses to zero — a typo'd stratum
    # value would silently return an empty corpus; fail loudly instead
    # (same stance as plans/features.spec_from_dict). Weight-0 targets
    # are an explicit exclude and may legitimately match nothing.
    # key=repr: stratum values can include None (dirty data) and would
    # break a plain sort inside the error path.
    absent = sorted(
        (k for k, w in tkeys.items() if w > 0 and counts.get(k, 0) == 0),
        key=repr,
    )
    if absent:
        raise ValueError(
            f"positive-weight target strata absent from the corpus: {absent} "
            f"(present: {sorted(counts, key=repr)[:20]})"
        )
    rates = mixture_rates({k: counts.get(k, 0) for k in tkeys}, tkeys)

    gate = F.pmod(
        md5_long32(F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))),
        F.lit(10000),
    )
    stratum_rate = F.lit(None).cast("int")
    for sk, bp in rates.items():
        cond = F.lit(True)
        for col, val in zip(strata, sk):
            cond = cond & (F.col(col) == F.lit(val))
        stratum_rate = F.when(cond, F.lit(bp)).otherwise(stratum_rate)
    return df.withColumn("__rate", stratum_rate).filter(
        F.col("__rate").isNotNull() & (gate < F.col("__rate"))
    ).drop("__rate")


def source_kl(
    df: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum unigram KL divergence ``KL(P_s || P_global)`` — the
    "how far is this source's language from the corpus" ranking a
    data-mixing stage runs per source (the lexical sibling of
    embedding-space PSI drift).

    Add-one smoothing over the observed global vocabulary V:
    ``p_w = (c_w+1)/(n_s+V)``, ``q_w = (g_w+1)/(N+V)``. Summing the
    ``p ln(p/q)`` term for every word ABSENT from a stratum would
    explode |strata| x V rows, so the absent mass is folded in closed
    form. With per-stratum sorted folds over PRESENT words only —
    ``g1 = sum (c+1) ln(c+1)``, ``g2 = sum (c+1) ln q``,
    ``g3 = sum ln q`` — and one global sorted fold
    ``lnq_all = sum_w ln q_w``, the whole divergence collapses to

        KL = (g1 - g2 + g3 - lnq_all) / den - ln(den),  den = n_s + V

    (derivation: split present/absent, factor 1/den out of every p,
    and note absent-count A = V - n_types makes the ln(den)
    coefficients telescope to den). Exactly linear in (stratum, word)
    pairs; the global V-sized fold happens once, not per stratum.

    Every fold runs in lexicographic word order (the
    ``behavior_entropy`` sorted-fold device) and the final expression
    is a fixed chain of double ops — an external engine replays the
    bits. Shape: two word-keyed partial aggs, one word equi-join, one
    per-stratum fold agg, two driver scalars (V, N). Output:
    ``(stratum, n_tokens, n_types, kl)``, kl rounded to 6dp.
    """
    w = df.select(
        F.col(stratum_col).alias("__s"), F.explode(words(text_col)).alias("__w")
    )
    sc = w.groupBy("__s", "__w").agg(F.count(F.lit(1)).alias("__c"))
    gc = sc.groupBy("__w").agg(F.sum("__c").alias("__g"))
    tot = gc.agg(F.count(F.lit(1)).alias("__v"), F.sum("__g").alias("__n")).collect()[0]
    v = int(tot["__v"])
    qden = float(int(tot["__n"]) + v)

    def _fold(term):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__w", "__c", "__g"))),
                term,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    lnq = lambda s: F.log((s["__g"].cast("double") + F.lit(1.0)) / F.lit(qden))
    cp1 = lambda s: s["__c"].cast("double") + F.lit(1.0)
    # global fold of ln q over ALL words — one driver scalar
    lnq_all = float(
        gc.select(F.col("__w"), F.lit(0).alias("__c"), "__g")
        .agg(_fold(lnq).alias("f"))
        .collect()[0]["f"]
    )
    per = sc.join(gc, "__w").groupBy("__s").agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        _fold(lambda s: cp1(s) * F.log(cp1(s))).alias("__g1"),
        _fold(lambda s: cp1(s) * lnq(s)).alias("__g2"),
        _fold(lnq).alias("__g3"),
    )
    den = (F.col("n_tokens") + F.lit(v)).cast("double")
    kl = (
        F.col("__g1") - F.col("__g2") + F.col("__g3") - F.lit(lnq_all)
    ) / den - F.log(den)
    return per.select(
        F.col("__s").alias(stratum_col),
        "n_tokens",
        "n_types",
        F.round(kl, 6).alias("kl"),
    )
