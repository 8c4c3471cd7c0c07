"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for semantics the built-in window aggregations can't
express (here: per-user lifetime running totals that survive across
micro-batches).

Scale notes: state is partitioned by the grouping key (user_id) in the
state store, so it shards across executors; each micro-batch touches only
the keys present in that batch. Timeouts would evict idle users — omitted
here because the demo corpus is bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value), updated every micro-batch.

    Emits the current lifetime totals for each user seen in the batch —
    a custom stateful operator the reference (batch-only pandas) has no
    counterpart for.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SEVEN_DAYS_US = 7 * 24 * 3600 * 1_000_000

ATTR_STATE_SCHEMA = StructType(
    [
        StructField("last_click_ts_us", LongType()),
        StructField("last_click_id", LongType()),
    ]
)

ATTR_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_id", LongType()),
        StructField("purchase_ts_us", LongType()),
        StructField("value", DoubleType()),
        StructField("attributed_click_id", LongType()),
    ]
)



def _session_tz(df: "DataFrame") -> str:
    return df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")


def _ts_us(ts, tz: str) -> int:
    """Event-time in epoch microseconds. Arrow hands the pandas UDF
    tz-NAIVE timestamps rendered in the SESSION timezone, so a bare
    ``.value`` is epoch time only when that zone is UTC; under any other
    session zone the naive wall-clock must be localized first or every
    emitted *_us drifts by the UTC offset (and silently disagrees with
    the batch twins' ``F.unix_micros``). Localization raises on a
    DST-ambiguous wall time — loud beats silently mis-ordered state.
    """
    t = pd.Timestamp(ts)
    if t.tz is None and tz not in ("UTC", "Etc/UTC", "GMT", "Z"):
        t = t.tz_localize(tz)
    return int(t.value // 1000)

def _attribute(
    tz: str, key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_ts, last_id = state.get if state.exists else (None, None)
    out: list[tuple] = []
    pdfs = [p for p in batches if len(p)]
    if pdfs:
        pdf = pd.concat(pdfs).sort_values(["ts", "event_id"])
        for ts, eid, etype, value in zip(
            pdf["ts"], pdf["event_id"], pdf["event_type"], pdf["value"]
        ):
            ts_us = _ts_us(ts, tz)
            if etype == "click":
                last_ts, last_id = ts_us, int(eid)
            elif etype == "purchase":
                hit = (
                    last_ts is not None
                    and ts_us - last_ts <= _SEVEN_DAYS_US
                )
                out.append(
                    (key[0], int(eid), ts_us, float(value),
                     last_id if hit else None)
                )
    if last_ts is not None:
        state.update((last_ts, last_id))
    if out:
        pdf_out = pd.DataFrame(
            out,
            columns=[
                "user_id", "purchase_id", "purchase_ts_us", "value",
                "attributed_click_id",
            ],
        )
        # unattributed purchases carry None: keep the column nullable-int
        # (a plain float64-with-NaN column would not Arrow-cast to long)
        pdf_out["attributed_click_id"] = pdf_out["attributed_click_id"].astype(
            "Int64"
        )
        yield pdf_out


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming last-touch attribution — the stateful-streaming twin of
    the batch e10 plan: per user, each purchase is credited to the most
    recent preceding click within a 7-day lookback, with the latest
    click carried ACROSS micro-batches in keyed state (so a click in
    Monday's batch attributes a purchase in Friday's).

    State is two longs per user (last click's event-time µs + id) —
    bounded by the user population, not stream length, and sharded by
    the grouping key across executors. Rows are re-sorted by
    (ts, event_id) within each (key, batch), so intra-batch disorder is
    handled; CROSS-batch event-time regressions (a late click arriving
    after a later purchase was already attributed) are the lambda-
    architecture gap — the batch e10 plan is the backfill that corrects
    them, exactly as a production attribution pipeline re-states
    yesterday's credit.
    """
    import functools

    return events.groupBy("user_id").applyInPandasWithState(
        functools.partial(_attribute, _session_tz(events)),
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("signup_us", LongType()),
        StructField("click_us", LongType()),
        StructField("purchase_us", LongType()),
    ]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("signup_us", LongType()),
        StructField("click_us", LongType()),
        StructField("purchase_us", LongType()),
    ]
)

_UNSET = -1


def _advance_funnel(
    tz: str, key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    s_us, c_us, p_us = state.get if state.exists else (_UNSET, _UNSET, _UNSET)
    was_converted = p_us != _UNSET
    pdfs = [p for p in batches if len(p)]
    if pdfs:
        pdf = pd.concat(pdfs).sort_values(["ts", "event_id"])
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            ts_us = _ts_us(ts, tz)
            if etype == "signup" and s_us == _UNSET:
                s_us = ts_us
            elif (
                etype == "click"
                and s_us != _UNSET
                and c_us == _UNSET
                and ts_us > s_us
            ):
                c_us = ts_us
            elif (
                etype == "purchase"
                and c_us != _UNSET
                and p_us == _UNSET
                and ts_us > c_us
            ):
                p_us = ts_us
    state.update((s_us, c_us, p_us))
    # emit ONLY on the conversion transition — an already-converted user
    # whose later batches carry more events must not re-append the row
    # (append-mode sinks would double-count conversions)
    if p_us != _UNSET and not was_converted:
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "signup_us": [s_us],
                "click_us": [c_us],
                "purchase_us": [p_us],
            }
        )


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming sequenced funnel — the stateful twin of the batch
    e5/e12 `_funnel_stages` construction: per user, keyed state carries
    the first signup, the first click strictly after it, and the first
    purchase strictly after that click across micro-batches (a signup in
    Monday's batch sequences a click in Friday's). A converted row
    (all three stages) is emitted once the purchase lands.

    Monotone-stage semantics match the batch conditional-MINs when
    events arrive in event-time order across batches (within a batch,
    rows are re-sorted by (ts, event_id)); cross-batch REGRESSIONS — an
    earlier signup arriving after a later click was already accepted —
    are the lambda gap, and the batch e5/e12 plans are the backfill, as
    with attribution_stream. State is three longs per user, bounded by
    population; NoTimeout here because the fixture population is
    bounded — production would evict converted/idle users.
    """
    import functools

    return events.groupBy("user_id").applyInPandasWithState(
        functools.partial(_advance_funnel, _session_tz(events)),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
