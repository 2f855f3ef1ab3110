"""Data-mixture operators: composition report, rate arithmetic, and the
hash-gated re-weighting sampler (driver gates `corpus_mix` /
`mixture_sample` / `ngram_freq` are the oracle-checked twins)."""

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.mixture import corpus_mix, mixture_rates, mixture_sample


def _docs(spark, spec):
    """spec: {lang: n_docs}; 12-word docs, globally unique ids."""
    rows, i = [], 0
    for lang, n in spec.items():
        for _ in range(n):
            rows.append((i, lang, " ".join(["w"] * 12)))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_mixture_rates_arithmetic():
    # limiting stratum: es (100 docs at weight 0.1 -> T_max = 1000)
    counts = {("en",): 800, ("de",): 300, ("es",): 100}
    rates = mixture_rates(counts, {("en",): 5, ("de",): 4, ("es",): 1})
    # T = min(800/.5, 300/.4, 100/.1) = 750 -> keep 375/300/75
    assert rates[("en",)] == int(10000 * 375 / 800)
    assert rates[("de",)] == 10000
    assert rates[("es",)] == int(10000 * 75 / 100)


def test_mixture_rates_rejects_unknown_stratum():
    with pytest.raises(ValueError, match="absent strata"):
        mixture_rates({("en",): 10}, {("en",): 1, ("xx",): 1})


def test_mixture_sample_whitelist_and_proportions(spark):
    df = _docs(spark, {"en": 400, "de": 200, "zh": 150})
    out = mixture_sample(df, targets={"en": 3, "de": 1}, strata="lang").toPandas()
    got = out.groupby("lang").size().to_dict()
    assert "zh" not in got  # spec is a whitelist
    # T = min(400/.75, 200/.25) = 533.3 -> keep ~400 en / ~133 de; the
    # hash gate is probabilistic in COUNT, so allow binomial slack
    assert got["en"] >= 380  # rate 10000bp -> exactly 400
    assert 100 <= got["de"] <= 166
    # achieved mix near 3:1
    ratio = got["en"] / got["de"]
    assert 2.2 <= ratio <= 4.0


def test_mixture_sample_deterministic_and_layout_independent(spark):
    df = _docs(spark, {"en": 300, "de": 100})
    a = {
        r["doc_id"]
        for r in mixture_sample(df, {"en": 1, "de": 1}, strata="lang").collect()
    }
    b = {
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(17), {"en": 1, "de": 1}, strata="lang"
        ).collect()
    }
    assert a == b


def test_corpus_mix_shares(spark):
    df = _docs(spark, {"en": 30, "de": 10})
    out = {r["lang"]: r for r in corpus_mix(df, strata="lang").collect()}
    assert out["en"]["n_docs"] == 30 and out["de"]["n_docs"] == 10
    assert out["en"]["n_tokens"] == 360 and out["de"]["n_tokens"] == 120
    assert abs(out["en"]["token_share"] - 0.75) < 1e-9
    assert abs(out["de"]["token_share"] - 0.25) < 1e-9


def test_ngram_doc_freq_dedups_within_doc(spark):
    from feat_spark.operators.keywords import ngram_doc_freq

    rows = [
        (1, "a b a b a b"),      # "a b" repeated inside one doc: counts once
        (2, "a b c d"),
        (3, "x y z w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["ngram"]: r["n_docs"] for r in ngram_doc_freq(df, n=2, min_docs=2).collect()}
    assert out == {"a b": 2}


def test_bigram_lm_scores_hand_computed(spark):
    """Tiny corpus with hand-computable MLE bigram probabilities, plus
    the filter's point: a doc with corpus-unusual transitions scores
    lower than a doc made of common ones."""
    import math

    from feat_spark.operators.keywords import bigram_lm_scores

    rows = [
        (1, "a b c"),   # bigrams: "a b", "b c"
        (2, "a b d"),   # bigrams: "a b", "b d"
        (3, "a"),       # too short: NULL score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    # model: C(a b)=2, C(b c)=1, C(b d)=1; C(a ·)=2, C(b ·)=2
    # doc1: ln(2/2) + ln(1/2) over 2 bigrams
    want1 = round((math.log(1.0) + math.log(0.5)) / 2, 6)
    assert out[1]["n_bigrams"] == 2 and abs(out[1]["avg_logp"] - want1) < 1e-9
    assert out[2]["avg_logp"] == out[1]["avg_logp"]  # symmetric corpus
    assert out[3]["avg_logp"] is None and out[3]["n_bigrams"] is None

    common = " ".join(["x y"] * 10)        # only common transitions
    rare = "x q y x z y"                   # transitions seen once each
    df2 = spark.createDataFrame(
        [(1, common), (2, common), (3, rare)], "doc_id long, text string"
    )
    sc = {r["doc_id"]: r["avg_logp"] for r in bigram_lm_scores(df2).collect()}
    assert sc[3] < sc[1]  # unusual doc scores lower


def test_mixture_sample_rejects_absent_stratum(spark):
    """Review finding r3: a typo'd target stratum must raise, not
    silently return an empty corpus (t_max would be 0)."""
    df = _docs(spark, {"en": 20, "de": 10})
    with pytest.raises(ValueError, match="absent from the corpus.*EN"):
        mixture_sample(df, targets={"EN": 1, "de": 1}, strata="lang")


def test_mixture_weight_zero_is_explicit_exclude(spark):
    """A weight-0 target is an explicit exclude and must NOT trip the
    absent-stratum guard even when the stratum has no rows."""
    df = _docs(spark, {"en": 20, "de": 10})
    out = mixture_sample(
        df, targets={"en": 1.0, "fr": 0.0}, strata="lang"
    ).toPandas()
    assert set(out["lang"].unique()) == {"en"}
    assert len(out) == 20  # en is the only positive stratum: keep all

    # direct mixture_rates callers get the loud failure too
    with pytest.raises(ValueError, match="zero rows"):
        mixture_rates({("en",): 10, ("fr",): 0}, {("en",): 1, ("fr",): 1})


def test_funnel_summary_empty_frame_is_zero(spark):
    from feat_spark.operators.funnel import funnel_summary, session_funnel

    df = spark.createDataFrame(
        [(1, 0, "click", 1.0)],
        "user_id long, session_id long, event_type string, ts double",
    )
    f = session_funnel(df, stages=("view", "click"))
    s = funnel_summary(f, stages=("view", "click")).collect()[0]
    assert s["n_view"] == 0 and s["n_click"] == 0
    assert s["rate_click"] is None  # 0/0 stays NULL, counts stay 0


def test_salted_only_map_non_key_raises_actionable(spark):
    from feat_spark.operators.salted import salted_group_agg

    df = spark.createDataFrame(
        [(1, {"a": 1}), (1, {"b": 2})], "k long, m map<string,long>"
    )
    with pytest.raises(ValueError, match="salt_col"):
        salted_group_agg(df, "k", {"m": ["count"]})
