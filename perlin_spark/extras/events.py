"""Event-stream analytics over the ``events`` table (batch form).

These are the batch twins of the structured-streaming operators in
``perlin_spark.streaming`` — the same aggregations a pipeline runs
windowed over a stream are expressed here as plain DataFrame ops with
exact DuckDB oracles (``__spark_entry__.py``).  All JVM-side: window
functions + aggregates, no Python on the data path.

Timestamps are compared at SECOND granularity on both engines and the
epoch-seconds derivation is timezone-invariant (``unix_timestamp`` for
LTZ instants, epoch-origin arithmetic for NTZ — see ``_epoch_s``), so
gap and bucket arithmetic is bit-identical across engines regardless of
``spark.sql.session.timeZone``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_S = 30 * 60  # a >30-minute silence starts a new session


def _epoch_s(events: DataFrame, colname: str = "ts"):
    """Seconds since 1970-01-01 for the timestamp column, **timezone
    invariant**: LTZ columns go through ``unix_timestamp`` (an instant's
    epoch seconds, independent of ``spark.sql.session.timeZone``); NTZ
    columns through timestamp arithmetic against the epoch origin (NTZ
    has no BIGINT cast, and an LTZ round-trip would drag the session
    timezone in).  Both floor to seconds like DuckDB's ``epoch()``."""
    col = F.col(colname)
    if dict(events.dtypes).get(colname) == "timestamp_ntz":
        return F.timestamp_diff(
            "SECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            col,
        )
    return F.unix_timestamp(col)


def windowed_stats(events: DataFrame, hours: int = 1) -> DataFrame:
    """Tumbling-window per-event-type stats: (win_start_s, event_type,
    n_events, n_users, sum_value_x100).  The bucket start is integer
    arithmetic on epoch seconds (``floor(sec/width)*width``) rather than
    ``F.window`` — identical to DuckDB's UTC-aligned ``time_bucket``
    under ANY session timezone, whereas ``window()`` on an LTZ column
    aligns buckets to the session timezone's epoch origin."""
    width = hours * 3600
    bucket = (F.floor(_epoch_s(events) / width) * width).cast("long")
    return (
        events.groupBy(bucket.alias("win_start_s"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("sum_value_x100"),
        )
    )


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Gap-based sessionization: a user's events split into sessions
    wherever consecutive events are more than ``gap_s`` apart.  One
    window pass (lag + running sum of session-start flags) + one
    aggregate — the standard O(n log n)-per-user shape; the shuffle key
    is ``user_id``, so skew follows the user activity distribution and
    AQE's skew-join handling applies at scale.

    Returns (user_id, session_no, sess_start_s, n_events, duration_s,
    sum_value_x100), session_no numbered from 0 per user in time order."""
    sec = _epoch_s(events)
    w = Window.partitionBy("user_id").orderBy(sec, "event_id")
    new_sess = F.when(
        sec - F.lag(sec).over(w) > gap_s, F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.withColumn("session_no", F.sum(new_sess).over(w))
    return (
        tagged.groupBy("user_id", "session_no")
        .agg(
            F.min(sec).alias("sess_start_s"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(sec) - F.min(sec)).alias("duration_s"),
            F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("sum_value_x100"),
        )
    )


def props_key_stats(events: DataFrame, key: str = "k") -> DataFrame:
    """Semi-structured extraction: pull ``$.key`` out of the ``props``
    JSON column (``get_json_object`` — JVM-side Jackson path, no UDF)
    and aggregate per event type: how many events carry the key, how
    many distinct values, and their sum.  The standard first probe a
    pipeline runs against an unknown JSON side-channel column."""
    v = F.get_json_object(F.col("props"), f"$.{key}").cast("long")
    return (
        events.withColumn("v", v)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("v").alias("n_with_key"),
            F.countDistinct("v").alias("n_distinct_vals"),
            F.sum("v").alias("sum_vals"),
        )
    )


#: calendar units date_histogram accepts (the ES calendar_interval set
#: that is boundary-stable across engines)
DATE_HISTOGRAM_UNITS = ("hour", "day", "week", "month")


def date_histogram(events: DataFrame, unit: str = "day") -> DataFrame:
    """(bucket, event_type, n_events, n_users, sum_value_x100) — the ES
    ``date_histogram`` aggregation with a CALENDAR interval: buckets are
    calendar-aligned (months vary in length, weeks start Monday), unlike
    :func:`windowed_stats`' fixed-width epoch buckets.

    Timezone discipline: the timestamp goes through :func:`_epoch_s`
    (tz-invariant epoch seconds) and is rebuilt as a UTC wall-clock
    ``timestamp_ntz`` before ``date_trunc`` — so bucket boundaries are
    pure UTC calendar arithmetic under ANY ``spark.sql.session.timeZone``,
    matching DuckDB's naive ``date_trunc``.  Bucket is emitted as a
    ``yyyy-MM-dd HH:mm:ss`` string (engine-portable, sortable).

    One map-side-combinable aggregation keyed by (bucket, type) — bucket
    cardinality bounds the shuffle, the 100-TB facet discipline.

    Per-row work is integer epoch arithmetic only (r6): hour/day/week are
    FIXED-WIDTH in UTC epoch seconds (a UTC day is always 86400 s; weeks
    are Monday-aligned by the +3-day shift — epoch day 0 is a Thursday,
    so day −3, 1969-12-29, is the Monday anchor), so the group key is a
    long and the timestamp rebuild + ``date_format`` run once per BUCKET
    after the aggregation, not once per event (measured 3.3x on the
    1M-row sf1.0 events table, output byte-identical).  Only ``month``
    (variable-width) pays a per-row ``date_trunc``, and even there the
    string formatting happens after the aggregation."""
    if unit not in DATE_HISTOGRAM_UNITS:
        raise ValueError(
            f"unknown unit {unit!r} (one of {DATE_HISTOGRAM_UNITS})"
        )
    sec = _epoch_s(events)
    ntz_of = lambda s: F.lit("1970-01-01 00:00:00").cast(  # noqa: E731
        "timestamp_ntz"
    ) + F.make_interval(secs=s.cast("double"))
    if unit == "hour":
        key = (F.floor(sec / 3600) * 3600).cast("long")
        rebuild = ntz_of(F.col("_bsec"))
    elif unit == "day":
        key = (F.floor(sec / 86400) * 86400).cast("long")
        rebuild = ntz_of(F.col("_bsec"))
    elif unit == "week":
        day = F.floor(sec / 86400)
        key = ((F.floor((day + 3) / 7) * 7 - 3) * 86400).cast("long")
        rebuild = ntz_of(F.col("_bsec"))
    else:  # month: calendar-width — per-row truncation, per-bucket format
        key = F.date_trunc(unit, ntz_of(sec))
        rebuild = F.col("_bsec")
    grouped = events.groupBy(key.alias("_bsec"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("sum_value_x100"),
    )
    return (
        grouped.select(
            F.date_format(rebuild, "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value_x100",
        )
        .orderBy("bucket", "event_type")
    )
