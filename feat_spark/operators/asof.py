"""Point-in-time (as-of) join — the engine's flagship operator.

For each left row ``(key, ts)`` pick the latest right row with
``ts' <= ts`` (or ``<`` with ``allow_exact_matches=False``) — zero
temporal leakage by construction. The reference library has no joins at
all (SURVEY.md §2.7); this operator is mandated by the north rule
("sort-merge as-of join keyed on (conv_id, ts) with broadcast fallback
for skewed conversations", BASELINE.json:6).

Three physical strategies, chosen DataFrame-side (no Catalyst
extension needed — SURVEY.md §4.2):

``union_window`` (default, the 100 TB path)
    Tag both sides, ``unionByName``, one shuffle on the key, a single
    sort per partition, then ``last(..., ignorenulls=True)`` over a
    ``rowsBetween(unboundedPreceding, 0)`` frame. Cost = one shuffle of
    |L|+|R| rows + per-partition sort: exactly a sort-merge join with
    no row explosion (a naive range join is O(|L|x|R|) per key).
    Right-side values ride in a packed struct so NULL attribute values
    forward-fill correctly (a NULL attr must still win over an older
    non-NULL row, matching ``pd.merge_asof``).

``broadcast``
    When the right side fits in memory: broadcast hash join on the key
    with the range predicate, then keep the max-``ts'`` candidate per
    left row. No shuffle of the (huge) left side at all.

``skew_aware``
    Heavy-hitter keys (detected with a cheap aggregate or supplied by
    the caller) take the broadcast path; the long tail takes
    union_window. This is the "salted repartitioning for hot
    conversations" answer that keeps window semantics exact — salting
    an *ordered* window would split history and corrupt the as-of
    result, so hot keys are isolated instead of salted
    (SURVEY.md §7 hard-part (c)).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SRC = "__asof_src"
_TS = "__asof_ts"
_SEQ = "__asof_seq"
_PACK = "__asof_pack"
_LUID = "__asof_luid"


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    suffix: str = "",
    strategy: str = "union_window",
    allow_exact_matches: bool = True,
    tolerance: str | None = None,
    include_matched_ts: bool = False,
    hot_keys: DataFrame | None = None,
    hot_threshold: int = 100_000,
    direction: str = "backward",
) -> DataFrame:
    """As-of join ``left`` with ``right`` on ``on`` + time.

    Returns ``left``'s columns plus each right ``value_col`` (suffixed),
    NULL where no right row precedes the left row (the
    asymmetric-undefined case of /root/reference/src/feat.erl:283-284:
    a not-yet-known attribute is *missing*, not a conflict).

    ``tolerance`` (e.g. ``"7 days"``) nulls matches farther from
    ``left_ts`` than the tolerance, mirroring
    ``pd.merge_asof(tolerance=...)``.

    ``direction`` mirrors ``pd.merge_asof``:

    * ``"backward"`` (default, the leakage-safe one): latest right row
      with ``ts' <= ts``. The only direction the feature pipeline
      itself ever uses.
    * ``"forward"``: earliest right row with ``ts' >= ts`` — label /
      outcome attachment (e.g. next order after an event). Reads the
      future by definition; the leakage audit treats its outputs as
      targets, never features.
    * ``"nearest"``: closer of the two; tie at equal distance goes to
      the backward match (pandas' rule). Physical cost: two window
      passes over the same key partitioning (union_window) or one
      per-key candidate scan (broadcast).
    """
    keys = _as_list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    value_cols = list(value_cols)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")

    if strategy == "cogroup_pandas":
        return _asof_cogroup(
            left, right, keys, left_ts, right_ts, value_cols, suffix,
            allow_exact_matches, tolerance, include_matched_ts, direction,
        )
    if strategy == "skew_aware":
        return _asof_skew_aware(
            left, right, keys, left_ts, right_ts, value_cols, suffix,
            allow_exact_matches, tolerance, include_matched_ts, hot_keys,
            hot_threshold, direction,
        )
    if direction == "nearest" and strategy == "union_window":
        return _asof_nearest_union(
            left, right, keys, left_ts, right_ts, value_cols, suffix,
            allow_exact_matches, tolerance, include_matched_ts,
        )

    if strategy == "union_window":
        out = _asof_union_window(
            left, right, keys, left_ts, right_ts, value_cols,
            allow_exact_matches, direction,
        )
    elif strategy == "broadcast":
        out = _asof_broadcast(
            left, right, keys, left_ts, right_ts, value_cols,
            allow_exact_matches, direction,
        )
    else:
        raise ValueError(f"unknown asof strategy: {strategy!r}")

    return _unpack(
        out, left.columns, value_cols, suffix, left_ts, tolerance,
        include_matched_ts, direction,
    )


def _pack_right(right: DataFrame, keys, right_ts, value_cols) -> DataFrame:
    """Project the right side to (keys, ts, seq, packed-values)."""
    # _SEQ breaks ties between right rows sharing (key, ts): the later
    # input row wins, like pd.merge_asof's last-occurrence rule. Stable
    # within one execution, which is the only scope a join needs.
    return right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.monotonically_increasing_id().alias(_SEQ),
        F.struct(
            *[F.col(c) for c in value_cols], F.col(right_ts).alias("__matched_ts")
        ).alias(_PACK),
    )


def _asof_union_window(
    left, right, keys, left_ts, right_ts, value_cols, exact, direction="backward"
) -> DataFrame:
    rgt = _pack_right(right, keys, right_ts, value_cols).withColumn(_SRC, F.lit(0))
    lft = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(None).cast("long").alias(_SEQ),
        F.lit(1).alias(_SRC),
    )
    both = lft.unionByName(rgt, allowMissingColumns=True)

    back = direction == "backward"
    # Ordering decides <= vs <: with exact matches a right row (src=0) at
    # ts sorts BEFORE a left row (src=1) at the same ts (so it is inside
    # the left row's preceding frame); without, it sorts after. _SEQ
    # keeps duplicate right timestamps deterministic. The forward
    # direction is the exact mirror (ts desc): the same preceding frame
    # then holds the rows at-or-after the left row, and flipping _SEQ
    # makes the EARLIEST input row win among equal right timestamps
    # (pd.merge_asof's forward rule; backward is last-wins).
    #
    # NULL timestamps never match, in either role, matching the
    # broadcast strategy (NULL comparison -> no match): NULL-ts rows
    # sort FIRST in both directions (asc default is nulls-first; forward
    # needs desc_nulls_first explicitly, or a NULL-ts left row would
    # sort last with every right row in its frame), and a NULL-ts right
    # row's pack is nulled so ignorenulls skips it.
    src_order = F.col(_SRC).asc() if exact else F.col(_SRC).desc()
    ts_order = F.col(_TS).asc() if back else F.col(_TS).desc_nulls_first()
    seq_order = F.col(_SEQ).asc_nulls_last() if back else F.col(_SEQ).desc_nulls_last()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, src_order, seq_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = both.withColumn(_PACK, F.when(F.col(_TS).isNotNull(), F.col(_PACK)))
    filled = both.withColumn(_PACK, F.last(_PACK, ignorenulls=True).over(w))
    return filled.filter(F.col(_SRC) == 1)


def _asof_broadcast(
    left, right, keys, left_ts, right_ts, value_cols, exact, direction="backward"
) -> DataFrame:
    rgt = _pack_right(right, keys, right_ts, value_cols)
    lft = left.withColumn(_LUID, F.monotonically_increasing_id())
    cond = F.lit(True)
    for k in keys:
        cond = cond & (lft[k] == rgt[k])
    if direction == "backward":
        cond = cond & (rgt[_TS] <= lft[left_ts] if exact else rgt[_TS] < lft[left_ts])
        # latest-preceding wins; among equal right ts the last input row
        order = [F.col(_TS).desc_nulls_last(), F.col(_SEQ).desc_nulls_last()]
    elif direction == "forward":
        cond = cond & (rgt[_TS] >= lft[left_ts] if exact else rgt[_TS] > lft[left_ts])
        # earliest-following wins; among equal right ts the first input row
        order = [F.col(_TS).asc_nulls_last(), F.col(_SEQ).asc_nulls_last()]
    else:  # nearest: all same-key candidates, ranked by |distance|,
        # equal-distance tie to the backward side (pandas' rule), then
        # the per-side _SEQ rule (backward last-wins / forward first-wins).
        # NULL ts on either side -> no candidate (backward/forward get
        # this for free from NULL comparisons; here the rank-by-distance
        # would otherwise pick an arbitrary row among all-NULL distances)
        cond = cond & lft[left_ts].isNotNull() & rgt[_TS].isNotNull()
        if not exact:
            cond = cond & (rgt[_TS] != lft[left_ts])
        dist = F.abs(
            F.unix_micros(F.col(_TS).cast("timestamp"))
            - F.unix_micros(lft[left_ts].cast("timestamp"))
        )
        is_back = (F.col(_TS) <= lft[left_ts]).cast("int")
        order = [
            dist.asc_nulls_last(),
            is_back.desc_nulls_last(),
            F.when(F.col(_TS) <= lft[left_ts], -F.col(_SEQ))
            .otherwise(F.col(_SEQ))
            .asc_nulls_last(),
        ]
    joined = lft.join(F.broadcast(rgt), cond, "left").drop(*[rgt[k] for k in keys])
    w = Window.partitionBy(_LUID).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", _LUID)
    )


def _asof_nearest_union(
    left, right, keys, left_ts, right_ts, value_cols, suffix,
    exact, tolerance, include_matched_ts,
) -> DataFrame:
    """Nearest = backward pass + forward pass over the SAME key
    partitioning (AQE reuses the exchange), then a row-local chooser:
    the closer match wins, equal distance goes backward (pandas' rule).
    Tolerance applies per side BEFORE choosing, exactly like
    ``pd.merge_asof(direction="nearest", tolerance=...)``."""
    b = _asof_union_window(
        left, right, keys, left_ts, right_ts, value_cols, exact, "backward"
    ).select(*left.columns, F.col(_PACK).alias("__pack_b"))
    f = _asof_union_window(
        b, right, keys, left_ts, right_ts, value_cols, exact, "forward"
    ).select(*left.columns, "__pack_b", F.col(_PACK).alias("__pack_f"))

    lts = F.col(left_ts)
    pb, pf = F.col("__pack_b"), F.col("__pack_f")
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        pb = F.when(pb["__matched_ts"] >= lts - tol, pb)
        pf = F.when(pf["__matched_ts"] <= lts + tol, pf)
    micros = lambda c: F.unix_micros(c.cast("timestamp"))
    d_b = micros(lts) - micros(pb["__matched_ts"])
    d_f = micros(pf["__matched_ts"]) - micros(lts)
    chosen = (
        F.when(pb.isNull(), pf)
        .when(pf.isNull(), pb)
        .when(d_b <= d_f, pb)
        .otherwise(pf)
    )
    out = f.withColumn(_PACK, chosen)
    return _unpack(
        out, left.columns, value_cols, suffix, left_ts, None,
        include_matched_ts, "nearest",
    )


def detect_hot_keys(df: DataFrame, keys: Sequence[str], threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` — one cheap partial-agg
    pass (map-side combine makes this ~free relative to the join)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > threshold)
        .drop("__n")
    )


def _asof_skew_aware(
    left, right, keys, left_ts, right_ts, value_cols, suffix,
    exact, tolerance, include_matched_ts, hot_keys, hot_threshold,
    direction="backward",
) -> DataFrame:
    if hot_keys is None:
        hot_keys = detect_hot_keys(left, keys, hot_threshold)
    hot_keys = hot_keys.select(*keys)
    # Hot conversations: broadcast their (small) attr slices, never
    # shuffling the massive hot partitions into one task. Cold tail:
    # the standard sort-merge path.
    left_hot = left.join(F.broadcast(hot_keys), on=keys, how="left_semi")
    left_cold = left.join(F.broadcast(hot_keys), on=keys, how="left_anti")
    right_hot = right.join(F.broadcast(hot_keys), on=keys, how="left_semi")
    right_cold = right.join(F.broadcast(hot_keys), on=keys, how="left_anti")

    hot = _asof_broadcast(
        left_hot, right_hot, keys, left_ts, right_ts, value_cols, exact, direction
    )
    hot = _unpack(
        hot, left.columns, value_cols, suffix, left_ts, tolerance,
        include_matched_ts, direction,
    )
    if direction == "nearest":
        cold = _asof_nearest_union(
            left_cold, right_cold, keys, left_ts, right_ts, value_cols,
            suffix, exact, tolerance, include_matched_ts,
        )
    else:
        cold = _asof_union_window(
            left_cold, right_cold, keys, left_ts, right_ts, value_cols,
            exact, direction,
        )
        cold = _unpack(
            cold, left.columns, value_cols, suffix, left_ts, tolerance,
            include_matched_ts, direction,
        )
    return cold.unionByName(hot)


def _unpack(
    out: DataFrame, left_cols, value_cols, suffix, left_ts, tolerance,
    include_matched_ts, direction="backward",
) -> DataFrame:
    pack = F.col(_PACK)
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        lts = F.col(left_ts)
        if direction == "backward":
            ok = pack["__matched_ts"] >= lts - tol
        elif direction == "forward":
            ok = pack["__matched_ts"] <= lts + tol
        else:
            ok = (pack["__matched_ts"] >= lts - tol) & (pack["__matched_ts"] <= lts + tol)
        pack = F.when(ok, pack)
    cols = [F.col(c) for c in left_cols]
    cols += [pack[c].alias(f"{c}{suffix}") for c in value_cols]
    if include_matched_ts:
        cols.append(pack["__matched_ts"].alias(f"matched_ts{suffix}"))
    return out.select(*cols)


def _asof_cogroup(
    left, right, keys, left_ts, right_ts, value_cols, suffix,
    exact, tolerance, include_matched_ts, direction="backward",
):
    """Cogrouped-pandas as-of: ``pd.merge_asof`` per key group via
    ``cogroup().applyInPandas`` — the vectorized-pandas surface of the
    engine (SURVEY.md §2.11; north_star "vectorized pandas/Arrow UDFs").

    Same semantics as union_window (last-wins on right-ts ties matches
    the _SEQ rule; missing right history -> NULLs). Physical profile:
    one shuffle of each side on the key, then Arrow batches through
    Python — slower than the pure-JVM paths per byte, but the template
    for as-of logic Spark expressions can't say (nearest-by-distance,
    interpolation, per-group models). Not for hot keys: one group is
    one pandas frame in one worker's memory.
    """
    from pyspark.sql import types as T

    rstruct = {f.name: f.dataType for f in right.schema.fields}
    out_fields = list(left.schema.fields)
    for c in value_cols:
        out_fields.append(T.StructField(f"{c}{suffix}", rstruct[c], True))
    if include_matched_ts:
        out_fields.append(
            T.StructField(f"matched_ts{suffix}", rstruct[right_ts], True)
        )
    schema = T.StructType(out_fields)

    left_cols = [f.name for f in left.schema.fields]
    out_names = [f.name for f in schema.fields]
    # pandas nullable dtypes per output column, so NULL-bearing integer
    # columns survive the Arrow conversion (float64 NaN -> bigint fails)
    nullable = {}
    for f in schema.fields:
        if isinstance(f.dataType, (T.LongType,)):
            nullable[f.name] = "Int64"
        elif isinstance(f.dataType, (T.IntegerType,)):
            nullable[f.name] = "Int32"

    tol = tolerance
    vcols = list(value_cols)

    # NB: ties on right_ts within a key resolve by pandas frame order
    # here (post-shuffle arrival order) — callers needing deterministic
    # tie-breaks must dedupe the right side first. The JVM paths use
    # monotonically_increasing_id for a stable last-wins instead.
    def merge(l, r):
        import pandas as pd

        if len(l) == 0:
            return pd.DataFrame(columns=out_names)
        l = l.sort_values(left_ts, kind="mergesort")
        out = l.copy()
        if len(r) == 0:
            for c in vcols:
                out[f"{c}{suffix}"] = pd.Series([None] * len(l), dtype="object")
            out[f"matched_ts{suffix}"] = pd.NaT
        else:
            r = r.sort_values(right_ts, kind="mergesort")
            rr = r[[right_ts, *vcols]].rename(
                columns={c: f"{c}{suffix}" for c in vcols}
            )
            rr[f"matched_ts{suffix}"] = rr[right_ts]
            join_keys = (
                {"on": left_ts}
                if right_ts == left_ts
                else {"left_on": left_ts, "right_on": right_ts}
            )
            merged = pd.merge_asof(
                l, rr,
                **join_keys,
                allow_exact_matches=exact,
                tolerance=pd.Timedelta(tol) if tol else None,
                direction=direction,
                suffixes=("", "__r"),
            )
            out = merged
        out = out[[c for c in out_names if c in out.columns]]
        for c, dt in nullable.items():
            if c in out.columns:
                out[c] = out[c].astype(dt)
        return out[out_names] if all(c in out.columns for c in out_names) else out.reindex(columns=out_names)

    result = (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(merge, schema=schema)
    )
    if not include_matched_ts:
        result = result.select(*left_cols, *[f"{c}{suffix}" for c in vcols])
    return result
