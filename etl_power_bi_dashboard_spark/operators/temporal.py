"""Temporal join/rollup operators Spark has no single-call primitive for
— as-of join, bounded range join, hierarchical time rollup — each built as
a composition of DataFrame ops (no UDFs), with the shuffle structure a
100 TB event table needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_value_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for every left row, the most recent right row with
    right.ts <= left.ts, per key.

    Spark-first strategy: tag and union the two inputs, sort within each
    key partition once, and carry the latest right values forward with an
    ignore-nulls `last` window — ONE shuffle on the key, no range
    self-join blowup, works at any key cardinality. (The pandas
    counterpart is merge_asof; Spark has no built-in.)

    ``tiebreak`` names a right column that orders equal-timestamp right
    rows (ascending; the LARGEST value wins, being carried last) — the
    same determinism knob as :func:`asof_join_forward`. Without it, two
    right rows at the same instant make the carried values
    partition-order dependent.
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, ts)
    ]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_rts", F.lit(None).cast("timestamp"))
    for c in right_value_cols:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    )
    l_cols = [c for c in left.columns]
    unioned = l_tag.select(
        *l_cols, "_side", "_rts", *[f"_r_{c}" for c in right_value_cols]
    ).unionByName(
        r_tag.select(
            *[
                F.col(c) if c in (on, ts) else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                for c in l_cols
            ],
            "_side",
            "_rts",
            *[f"_r_{c}" for c in right_value_cols],
        )
    )
    # right rows sort before left rows at the same timestamp (asof <=);
    # the optional tiebreak orders equal-ts right rows (left rows carry
    # NULL there and sort first within their _side group — harmless)
    order = [F.col(ts), F.col("_side")]
    if tiebreak is not None:
        order.append(F.col(f"_r_{tiebreak}"))
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *l_cols,
        "_side",
        F.last("_rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_value_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of join: for every left row, the EARLIEST right row
    with right.ts >= left.ts, per key — :func:`asof_join` mirrored in
    time (pandas ``merge_asof(direction='forward')``), the
    time-to-next-event primitive behind conversion-lag and
    time-to-repair analyses.

    Same single-shuffle strategy: tag + union, one sort per key, carry
    the nearest following right values backward with an ignore-nulls
    ``first`` over the frame starting at the current row. Left rows sort
    BEFORE right rows at the same timestamp so an equal-ts right row
    satisfies the >= match. ``tiebreak`` names a right column that
    orders equal-timestamp right rows (ascending) — without it, two
    right rows at the same instant make the pick engine-dependent.
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, ts)
    ]
    l_tag = left.withColumn("_side", F.lit(0)).withColumn(
        "_rts", F.lit(None).cast("timestamp")
    )
    for c in right_value_cols:
        l_tag = l_tag.withColumn(
            f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c])
        )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.col(ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    )
    l_cols = list(left.columns)
    unioned = l_tag.select(
        *l_cols, "_side", "_rts", *[f"_r_{c}" for c in right_value_cols]
    ).unionByName(
        r_tag.select(
            *[
                F.col(c)
                if c in (on, ts)
                else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                for c in l_cols
            ],
            "_side",
            "_rts",
            *[f"_r_{c}" for c in right_value_cols],
        )
    )
    order = [F.col(ts), F.col("_side")]
    if tiebreak is not None:
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = unioned.select(
        *l_cols,
        "_side",
        F.first("_rts", ignorenulls=True).over(w).alias("next_ts"),
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"next_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 0).drop("_side")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_id: str = "right_id",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Nearest as-of join: for every left row, the right row (same key)
    with the SMALLEST |right.ts − left.ts| — pandas
    ``merge_asof(direction='nearest')``, the third as-of semantic after
    backward (:func:`asof_join`) and forward (:func:`asof_join_forward`).
    Ties in |Δ| (a candidate exactly Δ before and another exactly Δ
    after) resolve to the EARLIER candidate, so the pick is a
    deterministic function of the data. ``tolerance_seconds`` nulls out
    matches farther than the bound on BOTH sides (merge_asof's
    ``tolerance``).

    ONE shuffle and ONE sort: tag + union both inputs, then two window
    passes over the SAME sorted key partition — an ignore-nulls ``last``
    over (unbounded-preceding, current) carries the latest right-at-or-
    before, an ignore-nulls ``first`` over (current, unbounded-following)
    carries the earliest right strictly after — and a row-level
    least-|Δ| pick. Right rows sort BEFORE left rows at equal ts, so an
    equal-timestamp right is a backward (Δ=0) match and the forward
    frame only ever sees strictly-later candidates — which can never win
    against Δ=0, keeping the two-window trick exact. Equal-ts right rows
    tie-break on ``right_id`` (backward keeps the largest id = last in
    sort order, forward the smallest = first in frame), making the pick
    engine-portable.

    Returns all left columns + ``nearest_ts``, ``nearest_<right_id>``,
    ``delta_seconds`` (signed: negative = matched earlier row), NULL on
    no match within tolerance.
    """
    l_tag = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_rts", F.lit(None).cast("timestamp"))
        .withColumn("_rid", F.lit(None).cast(dict(right.dtypes)[right_id]))
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(ts).alias("_rts"),
        F.col(right_id).alias("_rid"),
    )
    l_cols = list(left.columns)
    unioned = l_tag.select(*l_cols, "_side", "_rts", "_rid").unionByName(
        r_tag.select(
            *[
                F.col(c)
                if c in (on, ts)
                else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                for c in l_cols
            ],
            "_side",
            "_rts",
            "_rid",
        )
    )
    order = [F.col(ts), F.col("_side"), F.col("_rid").asc_nulls_last()]
    wb = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = unioned.select(
        *l_cols,
        "_side",
        F.last("_rts", ignorenulls=True).over(wb).alias("_prev_ts"),
        F.last("_rid", ignorenulls=True).over(wb).alias("_prev_id"),
        F.first("_rts", ignorenulls=True).over(wf).alias("_next_ts"),
        F.first("_rid", ignorenulls=True).over(wf).alias("_next_id"),
    ).filter(F.col("_side") == 1)
    d_prev = F.unix_micros(F.col(ts)) - F.unix_micros("_prev_ts")
    d_next = F.unix_micros("_next_ts") - F.unix_micros(F.col(ts))
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds) * 1_000_000
        prev_ok = F.col("_prev_ts").isNotNull() & (d_prev <= tol_us)
        next_ok = F.col("_next_ts").isNotNull() & (d_next <= tol_us)
    else:
        prev_ok = F.col("_prev_ts").isNotNull()
        next_ok = F.col("_next_ts").isNotNull()
    # prev wins ties (<=): the earlier candidate, per the contract above
    pick_prev = prev_ok & (~next_ok | (d_prev <= d_next))
    pick_next = next_ok & ~pick_prev
    choose = (
        lambda p, n: F.when(pick_prev, p).when(pick_next, n)
    )
    return carried.select(
        *l_cols,
        choose(F.col("_prev_ts"), F.col("_next_ts")).alias("nearest_ts"),
        choose(F.col("_prev_id"), F.col("_next_id")).alias(
            f"nearest_{right_id}"
        ),
        # negate the LONG µs before the double cast: a double-side
        # negation of a zero gap would yield IEEE -0.0 and hash-diverge
        # from the oracle's +0.0
        choose(
            (F.lit(0) - d_prev).cast("double") / 1e6,
            d_next.cast("double") / 1e6,
        ).alias("delta_seconds"),
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    window_seconds: int = 300,
    dedup: bool = True,
) -> DataFrame:
    """Bounded range join: pairs (l, r) with same key and
    l.ts <= r.ts < l.ts + window.

    Naive inequality joins plan as nested loops; instead both sides get a
    time-bucket key (bucket length = window) and join on
    (key, bucket ∈ {b, b+1}) — an equi-join with a 2× fan-out, then the
    exact range filter. At scale this is the standard interval-bucketing
    trick: shuffle by (key, bucket), no quadratic pair space.
    """
    win_us = window_seconds * 1_000_000
    l = left.select(
        F.col(on),
        F.col(ts).alias("l_ts"),
        F.floor(F.unix_micros(ts) / win_us).alias("_lb"),
    )
    r = right.select(
        F.col(on).alias("_ron"),
        F.col(ts).alias("r_ts"),
        F.floor(F.unix_micros(ts) / win_us).alias("_rb"),
    )
    l_exp = l.withColumn("_b", F.explode(F.array(F.col("_lb"), F.col("_lb") + 1)))
    joined = l_exp.join(
        r, (l_exp[on] == r["_ron"]) & (l_exp["_b"] == r["_rb"]), "inner"
    )
    out = joined.filter(
        (F.col("r_ts") >= F.col("l_ts"))
        & (
            F.unix_micros("r_ts")
            < F.unix_micros("l_ts") + F.lit(win_us)
        )
    ).select(on, "l_ts", "r_ts")
    # the bucket explode never duplicates a (left_row, right_row) pair
    # (each right row's _rb equals exactly one of {_lb, _lb+1}), but the
    # (on, l_ts, r_ts) projection CAN repeat when the inputs hold
    # duplicate (key, ts) rows; dedup=True returns SQL-DISTINCT
    # semantics over the projection, dedup=False keeps multiplicity
    # (and skips that extra shuffle) for callers that count matches
    return out.distinct() if dedup else out


def hierarchical_rollup(
    events: DataFrame, ts: str = "ts", value: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Hypertable-style continuous aggregate: hourly partials (exact
    DECIMAL) that re-aggregate into daily totals without rescanning raw
    events — the two-tier rollup a time-series store materializes.
    Returns (hourly, daily)."""
    hourly = (
        events.groupBy(F.date_trunc("hour", ts).alias("bucket_hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value).cast("decimal(18,2)")).alias("tv_dec"),
        )
    )
    daily = (
        hourly.groupBy(F.date_trunc("day", "bucket_hour").alias("bucket_day"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("tv_dec").alias("tv_dec"),
        )
    )
    return hourly, daily


def coalesce_intervals(
    iv: DataFrame,
    key: str,
    s: str = "s",
    e: str = "e",
    order: str | None = None,
) -> DataFrame:
    """Temporal interval coalescing (Snodgrass's classic COALESCE): merge
    each key's overlapping-or-touching closed integer intervals [s, e]
    into maximal disjoint periods. Two intervals merge when the later
    start is <= the running max end (s == prev_e touches and merges;
    s == prev_e + 1 stays separate).

    The distributed form is the start-ordered cumulative-max sweep: a
    per-key window ordered by (s, e[, order]) computes max(e) over the
    STRICTLY preceding rows; a row whose s exceeds that max opens a new
    period, and a running sum of those open-flags is the period id. Two
    keyed window passes + one groupBy — shuffle is on the key alone, no
    self-join, no interval explode, so cost is O(n log n) per key and
    linear across keys at any scale.

    Returns one row per (key, period): period_start, period_end, and
    n_intervals folded into the period. All-integer arithmetic, so the
    result is engine-exact.
    """
    order_cols = [F.col(s), F.col(e)] + (
        [F.col(order)] if order is not None else []
    )
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev_max = F.max(F.col(e)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "_new",
        F.when(
            F.col(s) > F.coalesce(prev_max, F.lit(-(1 << 62)).cast("bigint")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grouped = flagged.withColumn(
        "_gid",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return grouped.groupBy(key, "_gid").agg(
        F.min(s).cast("bigint").alias("period_start"),
        F.max(e).cast("bigint").alias("period_end"),
        F.count("*").cast("bigint").alias("n_intervals"),
    ).drop("_gid")
