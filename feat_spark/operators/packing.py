"""Sequence packing — place documents into fixed-length training
sequences (the concat-then-chunk layout LLM pretraining uses).

Semantics: documents are concatenated in a deterministic order and the
token stream is cut every ``ctx_len`` tokens; each document's
placement is fully determined by the exclusive prefix sum of token
counts ahead of it. That prefix sum is the whole operator — packing is
windowed arithmetic, not a bin-packing search.

Scale shape: a single global prefix sum would serialize on one
partition, so the corpus is first split into ``n_shards`` deterministic
hash shards (portable md5-derived hash of the doc id — layout- and
engine-independent, same discipline as ``operators/sampling.py``), and
packing runs per shard: one shuffle keyed by shard, one in-partition
sort, one running sum. Shards are independent token streams — exactly
how a 1000-executor job would write 1000 packed output files. Skew is
bounded by corpus_tokens/n_shards by construction (the hash spreads
docs uniformly); for pathological single-doc skew the chunked-window
machinery (``operators/chunked.py``) applies unchanged.

Every output column is integer arithmetic over (hash, count) — the
DuckDB oracle replays packing bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import md5_long32, words


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Output (one row per doc):
    ``(doc_id, shard, n_tokens, offset, seq_index, seq_offset,
    spans_boundary)`` where ``offset`` is the doc's start position in
    its shard's concatenated stream, ``seq_index = offset // ctx_len``
    (which fixed-length training sequence the doc STARTS in),
    ``seq_offset = offset % ctx_len``, and ``spans_boundary`` flags
    docs cut by a sequence boundary (they continue into the next
    sequence — the concat-then-chunk regime; callers who forbid
    splitting filter or re-route these).

    ``token_col`` supplies precomputed token counts; the default is the
    whitespace word count (the honest proxy available without a
    tokenizer in this environment — swap in a real count column from
    ``functions.text`` token ops or an external tokenizer at will).
    Docs with zero tokens are kept (zero-width placements) so the
    output covers the corpus.
    """
    toks = (
        F.col(token_col)
        if token_col
        else F.size(words(text_col))
    ).cast("long")
    shard = F.pmod(md5_long32(F.col(id_col).cast("string")), F.lit(n_shards)).cast(
        "int"
    )
    base = df.select(
        F.col(id_col), shard.alias("shard"), toks.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = base.withColumn(
        "offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    seq_index = (F.col("offset") / ctx_len).cast("long")
    end_index = ((F.col("offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / ctx_len).cast("long")
    return placed.select(
        id_col,
        "shard",
        "n_tokens",
        "offset",
        seq_index.alias("seq_index"),
        (F.col("offset") % ctx_len).cast("long").alias("seq_offset"),
        (end_index > seq_index).alias("spans_boundary"),
    )


def packing_stats(packed: DataFrame, ctx_len: int) -> DataFrame:
    """Per-shard packing summary: sequences used, total tokens, fill
    ratio of the packed stream (= tokens / (n_seqs * ctx_len); the
    concat-then-chunk layout wastes only the final partial sequence per
    shard, so fill approaches 1 as shards grow)."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            F.ceil(F.col("total_tokens") / ctx_len).cast("long").alias("n_seqs"),
        )
        .select(
            "*",
            # nullif guards the empty-stream shard (0/0) identically to
            # the oracle's nullif
            F.round(
                F.col("total_tokens")
                / F.nullif(F.col("n_seqs") * F.lit(ctx_len), F.lit(0)),
                6,
            ).alias("fill_ratio"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the RAG/long-context
    companion to :func:`pack_sequences`: each document becomes
    overlapping chunks of ``chunk_tokens`` words starting every
    ``stride`` words (``stride <= chunk_tokens`` covers every token;
    the final chunk is clamped to the document end).

    Output one row per chunk: ``(doc_id, chunk_idx, start_tok,
    end_tok, n_chunk_tokens, chunk_md5)`` — the md5 of the chunk text
    keeps the frame narrow while still content-addressing each chunk
    (dedup chunks across docs by grouping on it). Pure integer
    arithmetic + array slicing, fully oracle-replayable; the explode is
    the only row multiplier (ceil(n/stride) chunks per doc).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    ws = words(text_col)
    n = F.size(ws)
    k = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    # integer ceil(k / stride) + 1 starts; doc lengths are far below
    # double-precision integer limits so the float division is exact
    n_starts = (F.floor((k + F.lit(stride - 1)) / F.lit(stride)) + 1).cast("int")
    base = df.select(
        F.col(id_col),
        ws.alias("__ws"),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), n_starts - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    end = F.least(start + chunk_tokens, F.col("__n"))
    chunk_text = F.concat_ws(" ", F.slice(F.col("__ws"), start + 1, end - start))
    return base.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        end.cast("long").alias("end_tok"),
        (end - start).cast("long").alias("n_chunk_tokens"),
        F.md5(chunk_text).alias("chunk_md5"),
    )


def assemble_context(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    order_cols: Sequence[str],
    token_col: str,
    budget: int,
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Token-budget context assembly — for every turn of a
    conversation, how many trailing turns (and how many tokens) fit in
    a ``budget``-token context window ending at (and including) that
    turn. THE serving-time question for transcript training data:
    "what context does turn i actually see under a B-token limit",
    computed leakage-safe (only turns at or before i are counted).

    The trick that keeps it distributed and O(n log n): with positive
    integer token counts the running sum ``cum_i`` is strictly
    increasing per conversation, so the earliest in-window turn is a
    VALUE lookup, not a scan — the window [j..i] fits iff
    ``cum_{j-1} >= cum_i - budget``, so ``j_min - 1`` is the SMALLEST
    k with ``cum_k >= cum_i - budget`` over the prefix-sum series
    (with the empty prefix ``cum_0 = 0`` included as a virtual row).
    That lookup is precisely a forward as-of join of the series
    against itself on the cumulative-token axis, so the whole operator
    is: one window pass (row_number + running sum) and one self
    :func:`feat_spark.operators.asof.asof_join` — the same
    union-window machinery the flagship runs at scale, skew story
    included. No per-row search, no quadratic pair join (the quadratic
    form is what the DuckDB oracle replays).

    A turn longer than the whole budget yields a context of just
    itself (n_context = 1, context_tokens = its own count > budget) —
    the honest truncation-needed signal.

    Output: key cols + ``id_cols`` (pass-through identity) +
    ``(turn_idx, turn_tokens, cum_tokens, n_context, context_tokens)``
    — all integers, bit-stable anywhere.
    """
    from feat_spark.operators.asof import asof_join

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ids = list(id_cols or [])
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    tok = F.col(token_col).cast("long")
    # ids may overlap keys/order_cols (event ids double as tiebreaks)
    carry, seen = [], set()
    for c in [*keys, *ids, *order_cols]:
        if c not in seen:
            carry.append(c)
            seen.add(c)
    base = df.select(*carry, tok.alias("__tok")).withColumn(
        "turn_idx", F.row_number().over(w).cast("long")
    ).withColumn("cum_tokens", F.sum("__tok").over(w))
    left = base.withColumn(
        "__probe", F.col("cum_tokens") - F.lit(int(budget)).cast("long")
    )
    # prefix-sum series INCLUDING the virtual empty prefix cum_0 = 0,
    # so early turns (whole history fits) resolve to j_min - 1 = 0
    right = base.select(
        *keys,
        F.col("cum_tokens").alias("__cum_r"),
        F.col("turn_idx").alias("__k"),
    ).unionByName(
        base.filter(F.col("turn_idx") == 1).select(
            *keys,
            F.lit(0).cast("long").alias("__cum_r"),
            F.lit(0).cast("long").alias("__k"),
        )
    )
    looked = asof_join(
        left,
        right,
        on=keys,
        left_ts="__probe",
        right_ts="__cum_r",
        value_cols=["__k"],
        direction="forward",
        include_matched_ts=True,
    )
    # matched __k = j_min - 1. A turn alone exceeding the budget
    # matches k = i (its own prefix is the first one >= the probe):
    # clamp to the context-of-itself convention.
    fits = F.col("__k") < F.col("turn_idx")
    n_ctx = F.when(fits, F.col("turn_idx") - F.col("__k")).otherwise(
        F.lit(1).cast("long")
    )
    ctx_tok = F.when(fits, F.col("cum_tokens") - F.col("matched_ts")).otherwise(
        F.col("__tok")
    )
    return looked.select(
        *keys,
        *ids,
        "turn_idx",
        F.col("__tok").alias("turn_tokens"),
        "cum_tokens",
        n_ctx.alias("n_context"),
        ctx_tok.alias("context_tokens"),
    )
