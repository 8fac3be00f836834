"""Event-time windowing — SURVEY §2 C55–C60, batch-first.

Same `F.window`/`F.session_window` expressions run unchanged under
Structured Streaming (pandas_db_sdk_spark.streaming wires readStream +
watermark around them; tests assert batch/stream parity). The DuckDB oracle
can only check the batch semantics, which is exactly why batch-first.

Spark tumbling/sliding windows align to the Unix epoch; oracles reproduce
that with integer epoch-µs bucket math (exact — no float time arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ._util import davg, dsum, registry, tables

QUERIES, ORACLE, q = registry()

US_5MIN = 300_000_000
US_10MIN = 600_000_000
US_30MIN = 1_800_000_000


@q(
    "c55_tumbling_window",
    f"""SELECT (epoch_us(ts) // {US_5MIN}) * {US_5MIN} AS window_start_us,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM events
        GROUP BY 1, 2""",
)
def c55(spark, sf_dir):
    """C55: tumbling 5-minute window per event type."""
    e = tables(spark, sf_dir)("events")
    return (
        e.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
            "total",
        )
    )


@q(
    "c56_sliding_window",
    f"""WITH e AS (SELECT epoch_us(ts) AS us, value FROM events),
            assigned AS (
              SELECT (us // {US_5MIN}) * {US_5MIN} - k * {US_5MIN} AS window_start_us, value
              FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k)
            )
        SELECT window_start_us, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM assigned GROUP BY 1""",
)
def c56(spark, sf_dir):
    """C56: sliding window, 10-minute width, 5-minute slide — every event
    lands in exactly two windows; the oracle reproduces the assignment with
    explicit bucket arithmetic."""
    e = tables(spark, sf_dir)("events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(F.unix_micros(F.col("window.start")).alias("window_start_us"), "n", "total")
    )


@q(
    "c57_session_window",
    f"""WITH ordered AS (
          SELECT user_id, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
          FROM events),
        flagged AS (
          SELECT user_id, us,
                 CASE WHEN prev_us IS NULL OR us - prev_us >= {US_30MIN} THEN 1 ELSE 0 END AS new_s
          FROM ordered),
        sessions AS (
          SELECT user_id, us,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged)
        SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
        FROM sessions GROUP BY user_id, session_id""",
)
def c57(spark, sf_dir):
    """C57: session windows (30-min gap) per user. Spark sessions are
    half-open [start, last+gap): an event at exactly prev+gap starts a new
    session — the oracle's gaps-and-islands uses `>=` to match."""
    e = tables(spark, sf_dir)("events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
        )
    )


@q(
    "c58_late_data_window",
    f"""WITH mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events)
        SELECT (epoch_us(ts) // {US_5MIN}) * {US_5MIN} AS window_start_us,
               count(*) AS n
        FROM events, mx
        WHERE epoch_us(ts) >= mx.max_us - {US_10MIN}
        GROUP BY 1""",
)
def c58(spark, sf_dir):
    """C58: watermark semantics, batch-checkable core: keep only events within
    the watermark horizon (10 min) of max event time, then window. The true
    streaming path (withWatermark + readStream) runs in
    pandas_db_sdk_spark.streaming with a batch-parity test."""
    e = tables(spark, sf_dir)("events")
    mx = e.agg(F.max(F.unix_micros("ts")).alias("max_us"))
    return (
        e.join(F.broadcast(mx))
        .filter(F.unix_micros("ts") >= F.col("max_us") - US_10MIN)
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("window.start")).alias("window_start_us"), "n")
    )


@q(
    "c59_dedup_by_key",
    """SELECT event_id, user_id, event_type FROM (
         SELECT event_id, user_id, event_type,
                row_number() OVER (PARTITION BY event_id ORDER BY epoch_us(ts)) AS rn
         FROM events) WHERE rn = 1""",
)
def c59(spark, sf_dir):
    """C59: dedup by event id (streaming dropDuplicates analogue; with a
    watermark in the streaming path so state is bounded)."""
    e = tables(spark, sf_dir)("events")
    return e.dropDuplicates(["event_id"]).select("event_id", "user_id", "event_type")


@q(
    "c60_stateful_running_max",
    """SELECT event_id, user_id,
              max(value) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING) AS running_max,
              CASE WHEN value >= max(value) OVER (PARTITION BY user_id ORDER BY event_id
                                                  ROWS UNBOUNDED PRECEDING)
                   THEN 1 ELSE 0 END AS is_new_peak
       FROM events""",
)
def c60(spark, sf_dir):
    """C60: stateful per-key processing — running max + new-peak flag per
    user, the batch-checkable twin of the streaming state op implemented with
    applyInPandasWithState in pandas_db_sdk_spark.streaming.stateful."""
    e = tables(spark, sf_dir)("events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    rmax = F.max("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        rmax.alias("running_max"),
        F.when(F.col("value") >= rmax, 1).otherwise(0).alias("is_new_peak"),
    )


US_15MIN = 900_000_000


@q(
    "c66_resample",
    f"""SELECT (epoch_us(ts) // {US_15MIN}) * {US_15MIN} AS bucket_start_us,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2""",
)
def c66(spark, sf_dir):
    """C66 (pandas `resample('15min').agg`): event-time bucketing via the
    timeseries.resample operator; bucket start exported as epoch-µs for
    exact integer comparison."""
    from .. import timeseries as TS
    from ._util import dsum

    e = tables(spark, sf_dir)("events")
    out = TS.resample(
        e, "ts", "15 minutes", keys=["event_type"],
        aggs={"n": F.count("*"), "total": dsum("value")},
    )
    return out.select(
        F.unix_micros("bucket_start").alias("bucket_start_us"), "event_type", "n", "total"
    )


@q(
    "c67_ffill",
    """SELECT event_id, user_id,
              last_value(v IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
       FROM (SELECT event_id, user_id,
                    CASE WHEN value < 50 THEN NULL ELSE value END AS v
             FROM events)""",
)
def c67(spark, sf_dir):
    """C67 (pandas `groupby().ffill()`): forward fill per user over a
    sparsified value column, ordered by event_id."""
    from .. import timeseries as TS

    e = tables(spark, sf_dir)("events").select(
        "event_id", "user_id",
        F.when(F.col("value") >= 50, F.col("value")).alias("v"),
    )
    return TS.ffill(e, ["v"], "event_id", keys=["user_id"]).select(
        "event_id", "user_id", F.col("v").alias("v_filled")
    )


@q(
    "c58b_interval_join",
    f"""WITH v AS (SELECT user_id, epoch_us(ts) AS v_us, event_id AS view_id
                   FROM events WHERE event_type = 'view'),
            c AS (SELECT user_id, epoch_us(ts) AS c_us, event_id AS click_id
                  FROM events WHERE event_type = 'click')
        SELECT v.user_id, view_id, click_id,
               v_us AS view_ts_us, c_us AS click_ts_us
        FROM v JOIN c ON v.user_id = c.user_id
                     AND v.v_us <= c.c_us
                     AND c.c_us <= v.v_us + {US_30MIN}""",
)
def c58b(spark, sf_dir):
    """C58 variant: event-time interval join (view→click attribution within
    30 minutes) — the batch semantics of the stream-stream interval join
    (`streaming.windows.interval_join`; stream/batch parity pinned in
    tests/test_streaming.py). The time bound makes the join state finite
    under streaming and keeps the batch plan an equi-join on user_id with a
    range residual, never a pure range explosion."""
    from ..streaming.windows import interval_join

    e = tables(spark, sf_dir)("events")
    return interval_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "click"),
        tolerance="30 minutes",
    )


@q(
    "c68_interpolate",
    """SELECT event_id, user_id,
              round(CASE
                WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                WHEN pv IS NULL THEN NULL
                WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
                ELSE CAST(pv AS DOUBLE)
                     + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                       * ((t - pt) / (nt - pt))
              END, 6) AS v_interp
       FROM (
         SELECT event_id, user_id, v, CAST(epoch_us(ts) AS DOUBLE) AS t,
                last_value(v IGNORE NULLS) OVER wp AS pv,
                first_value(v IGNORE NULLS) OVER wn AS nv,
                last_value(CASE WHEN v IS NOT NULL
                                THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS)
                    OVER wp AS pt,
                first_value(CASE WHEN v IS NOT NULL
                                 THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS)
                    OVER wn AS nt
         FROM (SELECT event_id, user_id, ts,
                      CASE WHEN value < 50 THEN NULL ELSE value END AS v
               FROM events)
         WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                wn AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))""",
)
def c68(spark, sf_dir):
    """C68 (pandas `interpolate(method='index')`): time-weighted linear
    interpolation of a sparsified value column per user (timeseries.
    interpolate_linear) — nulls between known points take the linear value,
    trailing nulls carry forward, leading nulls stay null."""
    from .. import timeseries as TS

    e = tables(spark, sf_dir)("events").select(
        "event_id", "user_id",
        # integer epoch-µs time axis: both engines then interpolate on
        # IDENTICAL doubles (timestamp.cast(double) would be seconds here
        # vs µs in the oracle — same math, different last-ulp → round-6
        # boundary flips at scale)
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("value") >= 50, F.col("value")).alias("v"),
    )
    out = TS.interpolate_linear(
        e, "v", "ts_us", keys=["user_id"], out_col="v_interp", tiebreak=["event_id"]
    )
    return out.select("event_id", "user_id", "v_interp")


@q(
    "c57b_session_stats",
    f"""WITH ordered AS (
          SELECT user_id, epoch_us(ts) AS us, value,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
          FROM events),
        flagged AS (
          SELECT user_id, us, value,
                 CASE WHEN prev_us IS NULL OR us - prev_us >= {US_30MIN} THEN 1 ELSE 0 END AS new_s
          FROM ordered),
        sessions AS (
          SELECT user_id, us, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged)
        SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
               round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value), 6) AS avg_value
        FROM sessions GROUP BY user_id, session_id""",
)
def c57b(spark, sf_dir):
    """C57 variant: session windows carrying VALUE metrics (count + exact
    decimal sum + deterministic average per session) — the shape real
    session analytics takes (revenue/engagement per visit), same one
    re-key as c57; the gaps-and-islands oracle mirrors Spark's half-open
    session semantics with `>=`."""
    e = tables(spark, sf_dir)("events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
            F.round(davg("value"), 6).alias("avg_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
            "total_value",
            "avg_value",
        )
    )


@q(
    "c72_rolling_anomaly",
    """SELECT event_id, event_type, n_prev,
              CASE WHEN n_prev >= 10 AND var > 0
                   THEN round((value - mean) / sqrt(var), 6) + 0.0 END AS z,
              coalesce(abs(CASE WHEN n_prev >= 10 AND var > 0
                                THEN round((value - mean) / sqrt(var), 6) + 0.0
                           END) > 3,
                       FALSE) AS is_anomaly
       FROM (
         SELECT event_id, event_type, value,
                count(value) OVER w AS n_prev,
                CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                    / count(value) OVER w AS mean,
                (CAST(sum(CAST(value * value AS DECIMAL(24,4))) OVER w AS DOUBLE)
                 - pow(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE), 2)
                   / count(value) OVER w)
                / (count(value) OVER w - 1) AS var
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                      ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))""",
)
def c72(spark, sf_dir):
    """C66–C69 sibling: rolling z-score anomaly detection
    (timeseries.rolling_zscore) — each event scored against the preceding
    50 events of its type; decimal-exact moments make the score engine-
    deterministic. One window re-key."""
    from .. import timeseries as TS

    e = tables(spark, sf_dir)("events")
    out = TS.rolling_zscore(e, "value", "event_id", ["event_type"], window=50)
    return out.select("event_id", "event_type", "n_prev", "z", "is_anomaly")


@q(
    "c78_sessionize_gap",
    f"""WITH s AS (
         SELECT user_id, event_id, epoch_us(ts) AS us, value,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {US_30MIN}
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       r AS (
         SELECT user_id, us, value,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id) AS session_seq
         FROM s)
       SELECT user_id, CAST(session_seq AS INT) AS session_seq,
              CAST(count(*) AS BIGINT) AS n_events,
              min(us) AS start_us,
              max(us) - min(us) AS duration_us,
              CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       FROM r GROUP BY user_id, session_seq""",
)
def c78(spark, sf_dir):
    """C-ext (r5): batch gap-sessionization — the lag/flag/cumsum idiom
    (new session when >30 min since the previous event), then per-session
    stats. The c57 session_window twin for pipelines that need the session
    SEQUENCE NUMBER per user. Both windows and the final aggregate re-key
    on user_id, so the whole query is ONE exchange; epoch-µs integer
    arithmetic keeps the gap compare engine-exact."""
    e = tables(spark, sf_dir)("events")
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select("user_id", "event_id", us.alias("us"), "value").withColumn(
        "new_s",
        (
            F.lag("us").over(W.partitionBy("user_id").orderBy("us", "event_id")).isNull()
            | (F.col("us") - F.lag("us").over(W.partitionBy("user_id").orderBy("us", "event_id")) > US_30MIN)
        ).cast("int"),
    )
    r = s.withColumn(
        "session_seq",
        F.sum("new_s").over(
            W.partitionBy("user_id").orderBy("us", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ).cast("int"),
    )
    return r.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        dsum("value").alias("total_value"),
    )


@q(
    "c79_funnel_windows",
    f"""WITH e AS (
         SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                    AS next_click_us
         FROM events)
       SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_views,
              CAST(count(*) FILTER (WHERE next_click_us - us <= {US_30MIN}) AS BIGINT)
                  AS n_converted,
              round(count(*) FILTER (WHERE next_click_us - us <= {US_30MIN})::DOUBLE
                    / count(*), 6) AS conversion_rate
       FROM e WHERE event_type = 'view'
       GROUP BY user_id""",
)
def c79(spark, sf_dir):
    """C-ext (r5): time-bounded funnel — per user, the fraction of 'view'
    events followed by a 'click' within 30 minutes. The sequence match is
    a REVERSE RUNNING MIN of click timestamps over each user's ordered
    events (next_click_us), so no view-to-click range join ever happens:
    one user-keyed window + the same-keyed aggregate = one exchange, and
    the 30-minute bound is integer µs arithmetic."""
    e = tables(spark, sf_dir)("events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    next_click = F.min(
        F.when(F.col("event_type") == "click", F.col("us"))
    ).over(w)
    base = (
        e.select("user_id", "event_type", "event_id", "ts", us.alias("us"))
        .withColumn("next_click_us", next_click)
        .filter(F.col("event_type") == "view")
    )
    converted = (F.col("next_click_us") - F.col("us")) <= US_30MIN
    return base.groupBy("user_id").agg(
        F.count("*").alias("n_views"),
        F.count(F.when(converted, 1)).alias("n_converted"),
        F.round(
            F.count(F.when(converted, 1)).cast("double") / F.count("*"), 6
        ).alias("conversion_rate"),
    )


@q(
    "c82_ewma",
    """WITH RECURSIVE e AS (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS rn
         FROM events),
       w AS (
         SELECT user_id, event_id, rn, value AS y FROM e WHERE rn = 1
         UNION ALL
         SELECT e.user_id, e.event_id, e.rn,
                (1.0 - 0.3) * w.y + 0.3 * e.value
         FROM w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
       SELECT user_id, event_id, y AS ewma FROM w""",
)
def c82(spark, sf_dir):
    """Timeseries (r6): per-user EWMA of event values (α=0.3,
    adjust=False) — the canonical non-associative scan
    (``timeseries.ewma``: applyInPandas per key, numpy scan; one user
    re-key, constant per-key state). The oracle replays the exact
    recursion with a RECURSIVE CTE in the engine's float-op order — the
    coefficient is spelled ``(1.0 - 0.3)``, NOT the literal 0.7 (a
    different double, 1-ulp off) — making both sides BIT-identical
    (verified: 0 bit mismatches over 10⁵ rows at sf0.1), so the outputs
    compare raw with NO rounding. Rounding is deliberately absent: with
    bit-equal inputs it is the round() implementations themselves that
    diverge (Spark rounds HALF_UP on the exact binary expansion via
    BigDecimal; DuckDB rounds the 10⁶-scaled double), flipping exact
    half-boundary values in both directions — 6 rows at sf0.1."""
    from .. import timeseries as TS

    e = tables(spark, sf_dir)("events")
    out = TS.ewma(e, "user_id", ["ts", "event_id"], "value", alpha=0.3)
    return out.select("user_id", "event_id", "ewma")


US_1H = 3_600_000_000


@q(
    "c83_ohlc_resample",
    f"""WITH b AS (SELECT event_type, (epoch_us(ts) // {US_1H}) * {US_1H} AS ws,
                          ts, event_id, value
                   FROM events),
       r AS (SELECT *,
                    row_number() OVER (PARTITION BY event_type, ws
                                       ORDER BY ts, event_id) AS rn_a,
                    row_number() OVER (PARTITION BY event_type, ws
                                       ORDER BY ts DESC, event_id DESC) AS rn_d
             FROM b)
       SELECT event_type, ws AS window_start_us,
              max(CASE WHEN rn_a = 1 THEN value END) AS open,
              max(value) AS high, min(value) AS low,
              max(CASE WHEN rn_d = 1 THEN value END) AS close,
              CAST(count(*) AS BIGINT) AS volume
       FROM r GROUP BY 1, 2""",
)
def c83(spark, sf_dir):
    """Timeseries (r6): OHLC candle resampling — open/high/low/close/
    volume per (event_type, hour), the market-data workhorse. One
    partial+final aggregate: open/close are ``min_by``/``max_by`` on the
    (ts, event_id) total order — orderable-struct argmin, no ranking
    window, no second pass — where the oracle (no arg-min on a composite
    key) pays two ranking windows."""
    e = tables(spark, sf_dir)("events")
    ordk = F.struct("ts", "event_id")
    return (
        e.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count("*").alias("volume"),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "open", "high", "low", "close", "volume",
        )
    )


@q(
    "c84_seasonal_decompose",
    """WITH daily AS (
         SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2)
                    AS value
         FROM orders GROUP BY 1, 2),
       t AS (SELECT o_orderpriority, day, value,
                    CASE WHEN count(*) OVER w = 7
                         THEN round(CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w
                                         AS DOUBLE) / 7, 6) END AS trend,
                    (day - DATE '1970-01-01') % 7 AS phase
             FROM daily
             WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       pm AS (SELECT o_orderpriority, phase,
                     CAST(sum(CAST(value - trend AS DECIMAL(28,10))) AS DOUBLE)
                     / count(*) AS pm
              FROM t WHERE trend IS NOT NULL GROUP BY 1, 2),
       se AS (SELECT o_orderpriority, phase,
                     round(pm - CAST(sum(CAST(pm AS DECIMAL(28,10)))
                                     OVER (PARTITION BY o_orderpriority)
                                     AS DOUBLE)
                                / count(*) OVER (PARTITION BY o_orderpriority),
                           6) AS seasonal
              FROM pm)
       SELECT t.o_orderpriority, t.day, t.value, t.trend, se.seasonal,
              round(t.value - t.trend - se.seasonal, 6) AS resid
       FROM t LEFT JOIN se
         ON t.o_orderpriority = se.o_orderpriority AND t.phase = se.phase""",
)
def c84(spark, sf_dir):
    """Timeseries (r6): classical additive seasonal decomposition of the
    daily revenue series per order priority (``timeseries.
    seasonal_decompose``, period 7): value = trend (centered 7-row moving
    average, null at series edges) + seasonal (mean detrended per
    epoch-day-mod-7 phase, re-centered to zero) + residual. Every window
    partitions by the series key — a series is calendar-bounded
    (~2.4k rows) regardless of corpus size, never the single-task global
    window; trend frames and phase means ride exact decimal accumulators,
    so both engines agree bit-for-bit despite DuckDB's segment-tree
    window evaluation. Phase uses epoch-day arithmetic, not dayofweek
    (whose origin differs between engines)."""
    from .. import timeseries as TS

    o = tables(spark, sf_dir)("orders")
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double"), 2
        ).alias("value")
    )
    return TS.seasonal_decompose(
        daily, "o_orderpriority", "day", "value", period=7
    )


@q(
    "c90_holt_linear",
    """WITH RECURSIVE e AS (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS rn
         FROM events),
       w AS (
         SELECT user_id, event_id, rn, value AS l, 0.0::DOUBLE AS b
         FROM e WHERE rn = 1
         UNION ALL
         SELECT e.user_id, e.event_id, e.rn,
                0.3 * e.value + (1.0 - 0.3) * (w.l + w.b),
                0.1 * ((0.3 * e.value + (1.0 - 0.3) * (w.l + w.b)) - w.l)
                    + (1.0 - 0.1) * w.b
         FROM w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
       SELECT user_id, event_id, l AS level, b AS trend,
              l + b AS forecast
       FROM w""",
)
def c90(spark, sf_dir):
    """Timeseries (r6c): per-user Holt double exponential smoothing
    (α=0.3, β=0.1) — level+trend forecasting, c82's 2-state sibling
    (``timeseries.holt_linear``: applyInPandas per key, numpy scan; one
    user re-key, two floats of state per key). The oracle replays the
    identical affine recurrence with a RECURSIVE CTE in the same
    float-op order INCLUDING the coefficient spelling — ``(1.0 - α)`` /
    ``(1.0 - β)`` computed, not the 1-ulp-different literal complements
    — making the [l, b] state bit-identical, so the outputs compare raw
    with NO rounding (rounding half-boundary semantics differ between
    the engines and flipped 4 bit-equal values at sf0.1; see c82)."""
    from .. import timeseries as TS

    e = tables(spark, sf_dir)("events")
    out = TS.holt_linear(e, "user_id", ["ts", "event_id"], "value", 0.3, 0.1)
    return out.select("user_id", "event_id", "level", "trend", "forecast")
