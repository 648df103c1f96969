"""Event-time operators for training-data pipelines: sessionization,
as-of join, tumbling-window rollups.

These are operators the reference lacks but any web-scale event/log
pipeline needs; each is a composition of built-in DataFrame ops (no
UDFs, no collects) chosen for its shuffle shape:

* sessionize — ONE shuffle on the entity key; the gap detection is a
  lag + running-sum window over the key's partition (classic
  sessionization; skewed users bound the partition, use the salt in
  ``canonicalize`` if an entity exceeds executor memory).
* asof_join — re-expressed as union + per-key window (last non-null
  preceding value) instead of a range join: a range join explodes to
  |left|x|right| per key before filtering; the union shape is
  O((|left|+|right|) log) with one shuffle on the key.
* tumbling_rollup — plain groupBy on (window, keys); map-side partial
  aggregation makes the shuffle carry one row per (window, key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(col):
    """unix_micros tolerant of TIMESTAMP_NTZ inputs (parquet event
    tables are NTZ; the session timezone is pinned to UTC, so the
    NTZ->TZ cast is deterministic)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Assign event-time sessions per key: a new session starts when
    the gap since the previous event exceeds ``gap_seconds``.  Output:
    input columns + ``session_id`` (= ``<key>-<n>``, n starting at 0
    in ts order).  ``tiebreak_col`` makes the ordering total when
    timestamps collide (None to order by ts alone)."""
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    # microsecond arithmetic: exact, and expressible identically in
    # any engine (second-truncation semantics differ between engines)
    new_sess = F.when(
        prev_ts.isNull()
        | (
            _micros(F.col(ts_col)) - _micros(prev_ts)
            > gap_seconds * 1_000_000
        ),
        1,
    ).otherwise(0)
    sess_n = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) - F.lit(1)
    return events.withColumn(
        "session_id", F.concat_ws("-", F.col(key_col).cast("string"), sess_n.cast("string"))
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-session rollup: (key, session_id, n_events, t_start, t_end,
    duration_sec)."""
    s = sessionize(events, gap_seconds, ts_col, key_col)

    return (
        s.groupBy(key_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("t_start"),
            F.max(ts_col).alias("t_end"),
            F.round(
                (F.max(_micros(F.col(ts_col))) - F.min(_micros(F.col(ts_col))))
                / 1_000_000.0,
                6,
            ).alias("duration_sec"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    right_ts_alias: str = "right_ts",
    right_value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the LATEST right
    row with ``right.ts <= left.ts`` for the same key (pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

    Implementation: tag + union + per-key ordered window carrying the
    last non-null right value forward — one shuffle on the key, no
    range-join explosion.  Rows with no preceding right row keep
    nulls; ``tolerance_seconds`` nulls matches older than the
    tolerance."""
    right_value_cols = right_value_cols or []
    lcols = left.columns
    l = left.select(
        F.lit(1).alias("_is_left"),
        F.col(ts_col),
        F.col(key_col),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
    )
    r = right.select(
        F.lit(0).alias("_is_left"),
        F.col(ts_col),
        F.col(key_col),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    )
    u = l.unionByName(r)
    # order right rows BEFORE left rows at equal ts (asof is inclusive)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in right_value_cols]
    carried_ts = F.last("_r_ts", ignorenulls=True).over(w).alias("_c_ts")
    out = u.select("*", carried_ts, *carried).where(F.col("_is_left") == 1)
    match_ok = F.col("_c_ts").isNotNull()
    if tolerance_seconds is not None:
        match_ok = match_ok & (
            _micros(F.col(ts_col)) - _micros(F.col("_c_ts"))
            <= tolerance_seconds * 1_000_000
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        F.when(match_ok, F.col("_c_ts")).alias(right_ts_alias),
        *[
            F.when(match_ok, F.col(f"_c_{c}")).alias(f"right_{c}")
            for c in right_value_cols
        ],
    )


def tumbling_rollup(
    events: DataFrame,
    window_seconds: int = 3600,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window aggregate: (window_start, *group_cols, cnt,
    sum, avg).  Uses epoch bucketing (expressible identically in any
    SQL engine; `F.window` produces the same buckets for tumbling
    windows)."""
    group_cols = group_cols or []
    bucket = F.timestamp_micros(
        (
            F.floor(_micros(F.col(ts_col)) / (window_seconds * 1_000_000))
            * (window_seconds * 1_000_000)
        ).cast("long")
    ).cast("timestamp_ntz")
    return (
        events.groupBy(bucket.alias("window_start"), *group_cols)
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    key_col: str | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    ``start <= ts <= end`` (inclusive both ends), optionally also
    matching on ``key_col``.

    Spark has no native range join; the naive ``ON ts BETWEEN s AND e``
    plans a BroadcastNestedLoop/cartesian — |points| x |intervals| work.
    Scale shape here: quantize time into ``bucket_seconds`` buckets,
    EXPLODE each interval over the buckets it covers, equi-join points
    to interval fragments on (bucket [, key]), then apply the exact
    range predicate.  Cost is |points| + sum(interval_len/bucket)
    through a hash join — linear, skew bounded by how many intervals
    overlap one bucket.  Pick ``bucket_seconds`` near the median
    interval length: too small explodes long intervals, too large
    piles unrelated intervals into each bucket."""
    if how not in ("inner", "left"):
        raise ValueError("range_join supports how='inner' or 'left'")
    us = bucket_seconds * 1_000_000
    p = points.withColumn("_b", F.floor(_micros(F.col(ts_col)) / us))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(_micros(F.col(start_col)) / us),
                F.floor(_micros(F.col(end_col)) / us),
            )
        ),
    )
    on = ["_b"] + ([key_col] if key_col else [])
    exact = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    if how == "inner":
        return p.join(iv, on).where(exact).drop("_b")
    # left: keep unmatched points with null interval columns — join
    # inner first, then union the unmatched remainder back in.  The
    # anti-join condition is eqNullSafe PER COLUMN: plain equality is
    # not null-safe, so a matched point row carrying a NULL in any
    # column would never equal itself in the anti-join and be emitted
    # twice (matched + spuriously "missing").  Point rows identical in
    # every column are indistinguishable and share one match verdict.
    matched = p.join(iv, on).where(exact).drop("_b")
    keep = [c for c in matched.columns]
    msel = matched.select(
        *[F.col(c).alias(f"_m_{c}") for c in points.columns]
    ).distinct()
    anti_cond = None
    for c in points.columns:
        term = F.col(c).eqNullSafe(F.col(f"_m_{c}"))
        anti_cond = term if anti_cond is None else (anti_cond & term)
    missing = p.drop("_b").join(msel, anti_cond, "left_anti")
    for c in keep:
        if c not in missing.columns:
            missing = missing.withColumn(c, F.lit(None).cast(matched.schema[c].dataType))
    return matched.unionByName(missing.select(*keep))


def sliding_rollup(
    events: DataFrame,
    window_seconds: int = 3600,
    slide_seconds: int = 1800,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sliding-window aggregate: each event contributes to
    window/slide overlapping windows (``F.window`` with a slide —
    Spark explodes the event into its windows before the groupBy, so
    the shuffle carries window/slide copies of each row's grouping
    key; keep the pre-agg projection narrow)."""
    group_cols = group_cols or []
    w = F.window(
        F.col(ts_col).cast("timestamp"),
        f"{window_seconds} seconds",
        f"{slide_seconds} seconds",
    )
    return (
        events.groupBy(w.alias("w"), *group_cols)
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            *group_cols,
            "cnt",
        )
    )


def window_funnel(
    events: DataFrame,
    stages: list[str],
    window: str = "INTERVAL 1 HOUR",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel match (ClickHouse ``windowFunnel`` semantics):
    per user, the maximum stage L such that stage events occur in
    order, all within ``window`` of the SAME stage-1 anchor event.
    Greedy earliest-next-match per level is optimal here (the deadline
    is fixed at anchor + window, so taking the min next timestamp can
    only preserve reachability).  Returns the (level, n_users)
    histogram over users that reached at least stage 1.

    Scale shape: each level is one user-key equi-join with a range
    residual + a min-aggregate on (user, anchor) — funnel depth many
    shuffles on the user key, never a self-cartesian; anchors (not raw
    events) flow between levels, so each level's relation shrinks
    monotonically."""
    w = F.expr(window)
    cur = events.where(F.col(type_col) == stages[0]).select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("t1")
    )
    levels = [cur.select("u").distinct().withColumn("lvl", F.lit(1))]
    cur = cur.withColumn("tcur", F.col("t1"))
    for i, st in enumerate(stages[1:], start=2):
        nxt = events.where(F.col(type_col) == st).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("tn")
        )
        cur = (
            cur.join(nxt, "u")
            .where((F.col("tn") > F.col("tcur")) & (F.col("tn") <= F.col("t1") + w))
            .groupBy("u", "t1")
            .agg(F.min("tn").alias("tcur"))
        )
        levels.append(cur.select("u").distinct().withColumn("lvl", F.lit(i)))
    lv = levels[0]
    for l in levels[1:]:
        lv = lv.unionByName(l)
    return (
        lv.groupBy("u")
        .agg(F.max("lvl").alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("level")
    )


def cohort_retention(
    events: DataFrame,
    origin: str = "2024-01-01",
    period_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-active
    period (cohort), counted again in every later period they return —
    the (cohort, week_offset, n_users) triangle every growth dashboard
    draws.  Period index = floor(days since ``origin`` / period_days),
    so the bucketing is calendar-stable and engine-portable (no
    ISO-week disagreements).

    Scale shape: one (user, period) distinct projection, one min
    aggregate for the cohort, one join back on the user key, one count
    — all hash-partitioned by user/cohort, nothing user-count-squared."""
    per = F.floor(
        F.datediff(F.col(ts_col).cast("date"), F.lit(origin).cast("date"))
        / F.lit(period_days)
    ).cast("long")
    act = events.select(F.col(user_col).alias("u"), per.alias("p")).distinct()
    cohort = act.groupBy("u").agg(F.min("p").alias("cohort"))
    return (
        act.join(cohort, "u")
        .groupBy("cohort", (F.col("p") - F.col("cohort")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "week_offset")
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: order each user's events by ``order_cols`` (the id
    column breaks timestamp ties deterministically), pair every event
    with its predecessor via LAG, and aggregate (src_type, dst_type)
    counts plus the row-normalized transition probability — the
    user-journey model behind next-event prediction and funnel
    mining (ClickHouse/Amplitude-style path analytics).

    Scale shape: the LAG window partitions by user — millions of
    small per-user sorts, embarrassingly parallel, no global sort.
    The normalization runs over the (|event types|^2)-sized count
    relation, effectively free.  p is an integer count divided once
    per output row: deterministic regardless of partitioning.
    """
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    trans = (
        events.withColumn("src", F.lag(type_col).over(w))
        .where(F.col("src").isNotNull())
        .groupBy(F.col("src"), F.col(type_col).alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("src")
    return (
        trans.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(tot), 6)
        )
        .orderBy("src", "dst")
    )


def zscore_outliers(
    events: DataFrame,
    by: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 2.5,
) -> DataFrame:
    """Per-group z-score anomaly detection: events whose ``value_col``
    deviates more than ``threshold`` sample standard deviations from
    their group's mean — the first-pass outlier sweep a metrics
    pipeline runs per event type (latency spikes, value anomalies).
    Returns (id, group, value, z) with z rounded to 6 dp, the full
    outlier set (no top-k — a LIMIT over float-ranked rows would make
    the result sensitive to last-ulp aggregation order).  Groups with
    fewer than 2 events (stddev undefined) or zero variance emit no
    outliers.

    Scale shape: one hash aggregate over the group key produces a
    |groups|-row stats table that broadcasts into the probe-side
    join — the event stream itself shuffles zero times; the filter
    and z computation are map-side expressions over the joined rows.
    """
    stats = events.groupBy(by).agg(
        F.avg(value_col).alias("_m"), F.stddev(value_col).alias("_sd")
    )
    z = (F.col(value_col) - F.col("_m")) / F.col("_sd")
    return (
        events.join(F.broadcast(stats), by)
        .where(F.col("_sd").isNotNull() & (F.col("_sd") > 0))
        .where(F.abs(z) > F.lit(threshold))
        .select(
            id_col,
            by,
            value_col,
            F.round(z, 6).alias("z"),
        )
        .orderBy(id_col)
    )


def decayed_counts(
    events: DataFrame,
    tau_seconds: float = 86400.0,
    by: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially time-decayed aggregates as of the stream's
    horizon: each event contributes exp(-(T - ts)/tau) where T =
    max(ts) — the batch replay of a decayed counter (the classic
    "recent activity matters more" rollup streaming systems keep as
    running state; tau is the e-folding half-life scale).  Computing
    it AT the horizon makes the result a pure function of the input
    relation — rerun-stable, engine-replayable, no wall clock.

    -> (group, n_events, decayed_count, decayed_value) per group,
    rounded to 6, ordered by group.  decayed_count is the decayed
    event mass (sum of weights), decayed_value the decayed sum of
    ``value_col``.

    Scale shape: T is a 1-row aggregate folded back as a LITERAL (the
    BM25 corpus-scalar pattern — a crossJoin of the 1-row plan would
    re-execute the scan per consumer), then ONE scan computes weights
    map-side and ONE hash aggregate (map-side combined) shuffles only
    |groups| partial rows."""
    t_us = events.agg(F.max(_micros(F.col(ts_col))).alias("t")).collect()[0]["t"]
    if t_us is None:
        return events.sparkSession.createDataFrame(
            [],
            f"{by} string, n_events bigint, decayed_count double, decayed_value double",
        )
    # age in MICROSECONDS as an exact BIGINT (timestamps carry micros;
    # a seconds-granular unix_timestamp would truncate), then one
    # double division — identical IEEE ops on both engines
    age = (F.lit(int(t_us)) - _micros(F.col(ts_col))).cast("double") / F.lit(1e6)
    w = F.exp(-age / F.lit(float(tau_seconds)))
    return (
        events.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(w), 6).alias("decayed_count"),
            F.round(F.sum(w * F.col(value_col)), 6).alias("decayed_value"),
        )
        .orderBy(by)
    )


def conversion_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every
    conversion event, the FIRST and the LAST non-conversion event type
    the same user emitted before it (the two classic marketing
    attribution models), aggregated to (first_touch, last_touch,
    conversions).  Conversions with no prior touch attribute to
    'none' (organic).

    Ordering is (ts, event_id) — the same tie-break every sequential
    op here uses (markov_transitions), so the result is deterministic
    under timestamp collisions.

    Scale shape: ONE per-user window pass (two IGNORE NULLS frames
    over the same sort — one shuffle on user_id, the sessionize
    shape), then a |type^2|-row aggregate.  Event payloads never
    move twice."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    enriched = events.select(
        user_col,
        type_col,
        F.coalesce(F.first(touch, ignorenulls=True).over(w), F.lit("none")).alias(
            "first_touch"
        ),
        F.coalesce(F.last(touch, ignorenulls=True).over(w), F.lit("none")).alias(
            "last_touch"
        ),
    )
    return (
        enriched.where(F.col(type_col) == conversion_type)
        .groupBy("first_touch", "last_touch")
        .agg(F.count(F.lit(1)).alias("conversions"))
        .orderBy("first_touch", "last_touch")
    )


def mad_outliers(
    events: DataFrame,
    by: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group anomaly detection via the modified z-score
    (Iglewicz-Hoaglin 1993): z = 0.6745 * (v - median) / MAD, flagged
    when |z| > ``threshold`` (3.5 is the canonical cut).  The
    mean/stddev sweep (:func:`zscore_outliers`) is itself corrupted by
    the outliers it hunts — one 1e9 spike inflates sigma until nothing
    else trips; median and MAD have a 50% breakdown point, so this is
    the sweep that still works on the heavy-tailed value streams a web
    pipeline actually emits.  Groups whose MAD is 0 (>= half the values
    identical) emit no outliers — same contract as the sd=0 gate.

    -> (id, group, value, z) rounded to 6 dp, full outlier set (no
    float-ranked LIMIT), ordered by id.

    Scale shape: exact medians cannot partial-aggregate, so the two
    median passes shuffle (group, value) pairs — 16 bytes/event, never
    the event payload.  Both |groups|-row stats tables broadcast into
    the probe joins; the flag itself is a map-side expression.  At the
    100-TB tier swap the exact percentile for the mergeable t-digest
    already in rel_quantile_sketch (same call shape, epsilon error) —
    the exact form here IS the verification oracle for that swap.
    Both engines interpolate the even-count median as (a+b)/2 over
    exact parquet doubles, so the cross-engine hash is stable.
    """
    med = events.groupBy(by).agg(F.percentile(value_col, 0.5).alias("_med"))
    dev = events.join(F.broadcast(med), by).select(
        by, F.abs(F.col(value_col) - F.col("_med")).alias("_adev")
    )
    mad = dev.groupBy(by).agg(F.percentile("_adev", 0.5).alias("_mad"))
    z = F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad")
    return (
        events.join(F.broadcast(med), by)
        .join(F.broadcast(mad), by)
        .where(F.col("_mad") > 0)
        .where(F.abs(z) > F.lit(threshold))
        .select(id_col, by, value_col, F.round(z, 6).alias("z"))
        .orderBy(id_col)
    )


def user_growth(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily audience growth curve: per calendar day, how many DISTINCT
    users were active, how many were seen for the first time ever, the
    returning remainder, and the running cumulative user count — the
    first chart on any ingest/crawl dashboard ("are we still
    discovering new hosts, or re-crawling the same ones?").  The same
    first-seen trick gives cumulative-distinct-over-time WITHOUT a
    cumulative DISTINCT: a user is new on exactly one day, so
    cumulative_users = running SUM of new_users — an O(|days|) window
    over a tiny relation instead of a per-day set union.

    -> (day string 'YYYY-MM-DD', active_users, new_users,
    returning_users, cumulative_users), ordered by day.

    Scale shape: one hash aggregate keyed on user (min ts — map-side
    combined, shuffles one 16-byte pair per user per partition) + one
    on (day, user) for activity (combines to one row per user-day
    before the exchange); the running sum orders |days| rows — dozens,
    never data-scale.  Event payloads are pruned at the scan.
    """
    day = F.date_format(F.col(ts_col).cast("timestamp"), "yyyy-MM-dd")
    first_seen = (
        events.groupBy(user_col)
        .agg(F.min(F.col(ts_col).cast("timestamp")).alias("_first_ts"))
        .select(F.date_format("_first_ts", "yyyy-MM-dd").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    active = (
        events.select(day.alias("day"), F.col(user_col).alias("_u"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(first_seen, "day", "left")
        .select(
            "day",
            "active_users",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn(
            "returning_users", F.col("active_users") - F.col("new_users")
        )
        .withColumn("cumulative_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


def value_histogram(
    events: DataFrame,
    k: int = 10,
    by: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-group equi-width value histogram: k buckets spanning the
    group's [min, max], the distribution-shape profile behind every
    metrics dashboard (and the sanity check the mean/stddev and
    quantile-sketch views can't give — bimodality, clipping, heaping).
    The top bucket is closed ([lo, max]) via the standard
    min(floor((v-min)/width), k-1) clamp; a constant group (max ==
    min) lands entirely in bucket 0 with width 0.  Only OBSERVED
    buckets are emitted (it's a group-by, not a dense grid).

    -> (group, bucket, lo, hi, cnt), lo/hi rounded 6, ordered by
    (group, bucket).

    Scale shape: one min/max aggregate broadcasts per-group bounds
    back onto the stream (the zscore_outliers shape), then ONE
    map-side-combined hash aggregate on (group, bucket) — the event
    stream shuffles zero times; bucket arithmetic is a single
    subtract/divide/floor per row, identical IEEE ops per engine, so
    the assignment is deterministic cross-engine."""
    bounds = events.groupBy(by).agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(k))
    bucket = F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - F.col("_mn")) / width).cast("int"),
            F.lit(k - 1),
        )
    )
    return (
        events.join(F.broadcast(bounds), by)
        .select(by, F.col("_mn"), F.col("_mx"), bucket.alias("bucket"))
        .groupBy(by, "bucket", "_mn", "_mx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            by,
            "bucket",
            F.round(
                F.col("_mn")
                + F.col("bucket").cast("double")
                * ((F.col("_mx") - F.col("_mn")) / F.lit(float(k))),
                6,
            ).alias("lo"),
            F.round(
                F.col("_mn")
                + (F.col("bucket") + 1).cast("double")
                * ((F.col("_mx") - F.col("_mn")) / F.lit(float(k))),
                6,
            ).alias("hi"),
            "cnt",
        )
        .orderBy(by, "bucket")
    )


def seasonal_anomalies(
    events: DataFrame,
    factor: float = 2.0,
    by: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Hour-of-day seasonal anomaly sweep: volume spikes relative to
    the SAME HOUR's cross-day baseline — the detector that doesn't cry
    wolf at every daily rush hour the way a global threshold does, and
    catches a 3am burst a daily-total view averages away.  A (group,
    date, hour) bucket is anomalous when its count exceeds ``factor``
    x its (group, hour-of-day) baseline.

    The baseline divides each hour-slot's TOTAL by the stream's day
    span (a folded scalar) rather than averaging observed buckets —
    silent hours count as zeros, so a slot that fires one day in
    thirty gets baseline total/30, not total/1 (the classic
    absent-bucket bias).

    -> (group, day, hour, cnt, baseline, ratio) for anomalous buckets,
    baseline/ratio rounded 6, ordered (group, day, hour).

    Scale shape: one map-side-combined hash aggregate to (group, day,
    hour) buckets — the only corpus-scale shuffle; the |groups|x24
    baseline relation broadcasts; the verdict compares an exact BIGINT
    against factor x one division — identical IEEE ops per engine."""
    day = F.date_format(F.col(ts_col).cast("timestamp"), "yyyy-MM-dd")
    hour = F.hour(F.col(ts_col).cast("timestamp"))
    buckets = events.groupBy(
        by, day.alias("day"), hour.alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    n_days = buckets.select("day").distinct().count()
    baseline = buckets.groupBy(by, "hour").agg(
        (F.sum("cnt").cast("double") / F.lit(float(n_days))).alias("_base")
    )
    ratio = F.col("cnt") / F.col("_base")
    return (
        buckets.join(F.broadcast(baseline), [by, "hour"])
        .where(F.col("cnt") > F.lit(float(factor)) * F.col("_base"))
        .select(
            by,
            "day",
            "hour",
            "cnt",
            F.round("_base", 6).alias("baseline"),
            F.round(ratio, 6).alias("ratio"),
        )
        .orderBy(by, "day", "hour")
    )


def time_to_convert(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion-latency distribution per signup cohort: for every
    user, the time from their FIRST event ever to their first
    ``conversion_type`` event, summarized per first-seen day — the
    "how long does conversion take, and is it drifting for newer
    cohorts" panel cohort_retention's did-they-come-back counts can't
    answer.

    -> (cohort_day, n_users, n_converted, conversion_rate,
    avg_ttc_s, median_ttc_s, p90_ttc_s), rates/latencies rounded 6,
    ordered by cohort_day.  Never-converting users count in the rate
    denominator and contribute NULL latency (excluded from the
    latency aggregates by definition).

    Scale shape: ONE hash aggregate keyed on user (two conditional
    MINs, map-side combined — the stream shuffles one 24-byte triple
    per user per partition), then a |days|-row aggregate.  Latencies
    are exact integer microsecond differences divided once.
    Percentiles are NEAREST-RANK (value at ceil(p*n) of the sorted
    latencies) — selection of an actual value, so there is no
    interpolation formula to keep in cross-engine parity (Spark's
    percentile and quantile_cont write (1-g)a+gb vs a+g(b-a): one ulp
    apart, enough to flip a 6dp round — measured on this very
    dataset); the per-cohort sorted array is cohort-bounded — swap
    for the t-digest of rel_quantile_sketch at the 100-TB tier."""
    ts = F.col(ts_col).cast("timestamp")
    per_user = events.groupBy(user_col).agg(
        F.min(_micros(ts)).alias("_first_us"),
        F.min(F.when(F.col(type_col) == conversion_type, _micros(ts))).alias(
            "_conv_us"
        ),
    )
    ttc = (F.col("_conv_us") - F.col("_first_us")).cast("double") / F.lit(1e6)
    per_user = per_user.select(
        F.date_format(
            F.timestamp_micros(F.col("_first_us")), "yyyy-MM-dd"
        ).alias("cohort_day"),
        ttc.alias("_ttc"),
    )
    agg = per_user.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("_ttc").alias("n_converted"),
        F.round(
            F.count("_ttc").cast("double") / F.count(F.lit(1)), 6
        ).alias("conversion_rate"),
        F.round(F.avg("_ttc"), 6).alias("avg_ttc_s"),
        F.array_sort(F.collect_list("_ttc")).alias("_arr"),
    )
    nc = F.size("_arr")

    def _rank(p: float):
        return F.when(
            nc > 0,
            F.round(
                F.element_at(
                    F.col("_arr"), F.ceil(F.lit(p) * nc).cast("int")
                ),
                6,
            ),
        )

    return agg.select(
        "cohort_day",
        "n_users",
        "n_converted",
        "conversion_rate",
        "avg_ttc_s",
        _rank(0.5).alias("median_ttc_s"),
        _rank(0.9).alias("p90_ttc_s"),
    ).orderBy("cohort_day")


def gini_concentration(
    events: DataFrame,
    by: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-group Gini coefficient of the value distribution — the
    concentration diagnostic ("does 1% of the traffic carry 90% of
    the value?") that a mean/stddev or histogram view doesn't expose
    as one number.  Standard sorted-rank identity over non-negative
    values: G = 2*sum(i*x_i) / (n*sum(x)) - (n+1)/n with x ascending,
    i = 1..n.  0 = perfectly even, -> 1 = fully concentrated.

    -> (group, n, total, gini round 6), ordered by group.  Groups with
    zero total emit gini 0.0 (no mass to concentrate).

    Determinism: the rank weights are exact integers; sum(i*x_i) is a
    LEFT-TO-RIGHT fold over the ascending-sorted array in BOTH engines
    (F.aggregate vs list_sum over list_transform — the cosine parity
    precedent), and the final expression is a fixed op chain over two
    scalars, rounded 6.

    Scale shape: one hash aggregate collects each group's values
    (group-bounded arrays — the nearest-rank caveat of
    time_to_convert applies: swap for the binned Lorenz estimate over
    rel_histogram buckets at the 100-TB tier); everything after is
    per-group array math in the scan stage."""
    agg = events.groupBy(by).agg(
        F.array_sort(F.collect_list(F.col(value_col).cast("double"))).alias("_x")
    )
    n = F.size("_x")
    total = F.aggregate("_x", F.lit(0.0), lambda a, v: a + v)
    wsum = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(1), n), F.col("_x"), lambda i, v: i.cast("double") * v
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    gini = F.when(
        total > 0,
        F.lit(2.0) * wsum / (n.cast("double") * total)
        - (n + 1).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        by,
        n.cast("long").alias("n"),
        F.round(total, 6).alias("total"),
        F.round(gini, 6).alias("gini"),
    ).orderBy(by)


def stickiness(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU / trailing-WAU stickiness — the engagement-frequency ratio
    (how much of the weekly audience shows up on a given day) that
    growth curves (user_growth) and retention cohorts don't express
    as a daily scalar.  WAU(d) counts distinct users active in
    [d - window_days + 1, d].

    Rolling DISTINCT doesn't decompose into a running sum, so each
    (day, user) activity fact is EXPLODED onto the ``window_days``
    future days it supports and counted distinct per target day —
    exact, one narrow fan-out of the (day, user) relation (x7, not
    x|events|), never a per-day re-scan.  Days with activity only in
    their trailing window (DAU 0) are not emitted — this reports on
    active days.

    -> (day, dau, wau, stickiness round 6), ordered by day.

    Scale shape: one distinct on (day, user) — the only corpus-scale
    shuffle; the support explode multiplies the user-day relation by
    window_days before ONE count-distinct aggregate."""
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    du = events.select(day.alias("_d"), F.col(user_col).alias("_u")).distinct()
    dau = du.groupBy(F.col("_d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    support = du.select(
        F.explode(
            F.sequence(
                F.col("_d"), F.date_add(F.col("_d"), window_days - 1)
            )
        ).alias("day"),
        "_u",
    )
    wau = support.groupBy("day").agg(F.count_distinct("_u").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation — the
    classic lifecycle panel (champions / loyal / at-risk /
    hibernating) that growth and retention views don't collapse into
    a per-user label.

    Per user: recency_days = days since last activity (vs the corpus
    max day), frequency = event count, monetary = exact decimal value
    sum.  Each metric is scored 1-4 against its interpolated quartile
    boundaries computed ONCE over the user relation and folded as
    literals (a 3-value scalar collect, never a global ntile window —
    a single-partition sort over 1e9 users is the scale killer this
    form avoids; score = 1 + #boundaries-strictly-exceeded is one
    scan-stage expression).  Recency scores inverted (most recent =
    4).

    Cross-engine determinism: monetary accumulates in DECIMAL(20,6)
    (double sums are partition-order dependent); quartile boundaries
    interpolate between adjacent order statistics, so a user metric
    can only EQUAL a boundary when the boundary lands exactly on a
    data point — exact in both engines — and strict `>` comparisons
    never straddle a ulp.

    -> (user_id, recency_days, frequency, monetary, r_score, f_score,
    m_score, segment), ordered by user_id.

    Scale shape: ONE (user) hash aggregate over the event scan,
    materialized once (localCheckpoint — the max-day and boundary
    collects and the final projection all read the user relation, not
    the corpus), one 3x3-scalar aggregate folded as literals, then
    pure scan-stage scoring — no window, no second corpus pass."""
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(day).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(value_col).cast("decimal(20,6)")).alias("_mon"),
    ).localCheckpoint(eager=True)
    max_day = per_user.agg(F.max("_last")).collect()[0][0]
    per_user = per_user.select(
        "user_id",
        F.datediff(F.lit(max_day), F.col("_last")).cast("long").alias(
            "recency_days"
        ),
        "frequency",
        F.col("_mon").cast("double").alias("monetary"),
    )
    bounds = per_user.agg(
        F.expr("percentile(recency_days, array(0.25, 0.5, 0.75))").alias("r"),
        F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias("f"),
        F.expr("percentile(monetary, array(0.25, 0.5, 0.75))").alias("m"),
    ).collect()[0]

    def _score(col, qs, invert=False):
        s = F.lit(1)
        for q in qs:
            s = s + (F.col(col) > F.lit(float(q))).cast("int")
        return (F.lit(5) - s if invert else s).alias(
            ("r" if invert else col[0]) + "_score"
        )

    scored = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        F.round("monetary", 6).alias("monetary"),
        _score("recency_days", bounds["r"], invert=True),
        _score("frequency", bounds["f"]),
        _score("monetary", bounds["m"]),
    )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "loyal")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg).orderBy("user_id")


def interevent_gaps(
    events: DataFrame,
    by: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-type inter-arrival profile: gap statistics between a user's
    consecutive events of the same type — the cadence panel (how often
    does a user click / purchase) plus Goh-Barabási burstiness
    B = (sigma - mu) / (sigma + mu) in [-1, 1]: -1 = perfectly
    periodic, 0 = Poisson, -> 1 = bursty.  The temporal texture view
    that sessionize (gap THRESHOLDING) and stickiness (day grain)
    don't expose.

    Gaps are exact integer-microsecond differences scaled to seconds;
    percentiles interpolate (the rel_percentile parity precedent);
    mean/stddev follow the zscore_outliers precedent.  Types with <2
    events per every user emit nothing (no gaps exist); burstiness is
    NULL when a type has a single gap (stddev undefined).

    -> (event_type, n_gaps, mean_gap, p50_gap, p90_gap, burstiness),
    seconds, rounded 6, ordered by type.

    Scale shape: ONE shuffle on (user, type) for the lag window (the
    sessionize partitioning — per-user streams are bounded), then one
    |types|-row hash aggregate; nothing else moves."""
    w = Window.partitionBy(user_col, by).orderBy(ts_col, id_col)
    g = events.withColumn("_p", F.lag(ts_col).over(w))
    gaps = g.where(F.col("_p").isNotNull()).select(
        F.col(by),
        (
            (_micros(F.col(ts_col)) - _micros(F.col("_p"))) / F.lit(1_000_000.0)
        ).alias("gap"),
    )
    sd, mu = F.stddev("gap"), F.avg("gap")
    return (
        gaps.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(mu, 6).alias("mean_gap"),
            F.round(F.expr("percentile(gap, 0.5)"), 6).alias("p50_gap"),
            F.round(F.expr("percentile(gap, 0.9)"), 6).alias("p90_gap"),
            F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
        )
        .orderBy(by)
    )


def cusum_changepoints(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    h_mult: float = 3.0,
) -> DataFrame:
    """Batch CUSUM mean-shift detection over the daily per-type event
    counts — the change-point sweep run over a metrics table before
    trusting a trend (did ingestion of this event type STEP up, or
    just wiggle?).  The sequential recurrence
    S_t = max(0, S_{t-1} + (x_t - mean)) is re-expressed CLOSED-FORM
    over windows: with P_t the running sum of (x_t - mean),
    S_t = P_t - min(0, min_{j<=t} P_j) — two frames over ONE
    per-type sort, no recursion, no driver loop (the prefix-min trick;
    the same move that turned kg_path_between's argmin into hash
    aggs).  Threshold h = h_mult * sqrt(mean), the Poisson-scaled
    rule of thumb.

    Engine-exact: counts are integers, mean is one IEEE division,
    both running aggregates accumulate in the SAME defined (day)
    order in either engine, and the emitted cusum is ROUND 6.

    Returns (event_type, day, cnt, cusum, shift) ordered by
    (event_type, day).

    Scale shape: one (type, day) hash agg shrinks the corpus to
    |types|x|days| rows; every window after that runs on the tiny
    aggregate — the raw event table never feels the sort."""
    daily = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        (F.sum("cnt") / F.count(F.lit(1))).alias("mean")
    )
    j = daily.join(F.broadcast(stats), "event_type")
    run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col("cnt") - F.col("mean")).over(run)
    withp = j.select("event_type", "day", "cnt", "mean", p.alias("p"))
    s = F.col("p") - F.least(F.lit(0.0), F.min("p").over(run))
    return (
        withp.select(
            "event_type",
            "day",
            "cnt",
            F.round(s, 6).alias("cusum"),
            (s > F.lit(h_mult) * F.sqrt(F.col("mean")))
            .cast("long")
            .alias("shift"),
        )
        .orderBy("event_type", "day")
    )


def scd2_history(
    events: DataFrame,
    attr,
    ts_col: str = "ts",
    user_col: str = "user_id",
    order_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history of a per-user
    attribute: consecutive runs of the same ``attr`` value collapse
    into validity intervals (valid_from, valid_to, is_current) — the
    gaps-and-islands pattern every warehouse dimension load runs,
    expressed as change-flag -> running island id -> one interval
    aggregate -> LEAD for the closing bound.  ``attr`` is a Column
    evaluated per event (e.g. a JSON field projection), so the
    change detection happens in the scan stage.

    Deterministic: the per-user order is the (ts, order_col) total
    order (the markov/attribution tie-break), islands are integer
    running sums, and intervals carry exact event timestamps.

    Returns (user, attr_value, valid_from, valid_to, n_events,
    is_current) ordered by (user, valid_from); the open interval has
    valid_to NULL and is_current = 1.

    Scale shape: everything rides ONE per-user sort — the change
    flag, the island sum, and (after a (user, island) hash agg
    shrinks rows to intervals) the LEAD all reuse it; nothing wider
    than (user, ts, attr) shuffles."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    base = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("oid"),
        attr.alias("attr_value"),
    )
    wo = Window.partitionBy("user").orderBy("ts", "oid")
    flag = base.select(
        "user",
        "ts",
        "oid",
        "attr_value",
        F.when(
            F.lag("attr_value").over(wo).isNull()
            | (F.col("attr_value") != F.lag("attr_value").over(wo)),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    flagged = flag.select(
        "user",
        "ts",
        "attr_value",
        F.sum("chg")
        .over(
            Window.partitionBy("user")
            .orderBy("ts", "oid")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("island"),
    )
    intervals = flagged.groupBy("user", "island").agg(
        F.min("attr_value").alias("attr_value"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wi = Window.partitionBy("user").orderBy("valid_from")
    return (
        intervals.select(
            "user",
            "attr_value",
            "valid_from",
            F.lead("valid_from").over(wi).alias("valid_to"),
            "n_events",
        )
        .withColumn(
            "is_current", F.col("valid_to").isNull().cast("long")
        )
        .orderBy("user", "valid_from")
    )
