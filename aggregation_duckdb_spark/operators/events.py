"""Event-time operators over the ``events`` table (batch forms).

The reference has no streaming surface (SURVEY §2.9); these are the
batch-capable Spark time operators — ``F.window`` tumbling/sliding
buckets and gap-based sessionization. The same transformations run
unchanged under Structured Streaming (see ``streaming/``): ``F.window``
is streaming-native, and the lag/cumsum sessionization maps to
``session_window`` there.

Determinism: bucket boundaries are epoch-aligned integer arithmetic;
sessionization orders by (ts, event_id) so ties can't reorder; value
sums are decimal-cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    ts_col: str = "ts", type_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Tumbling event-time windows: per (window, event_type) counts and
    value sums. One shuffle (the group-by); the bucket key is computed
    map-side."""
    win = F.window(F.col(ts_col), width)
    return (events
            .groupBy(win.getField("start").alias("window_start"), F.col(type_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col(value_col).cast("decimal(18,3)")).cast("double")
                  .alias("sum_value"))
            .orderBy("window_start", type_col))


def sliding_counts(events: DataFrame, width: str = "1 hour",
                   slide: str = "30 minutes", ts_col: str = "ts",
                   type_col: str = "event_type") -> DataFrame:
    """Sliding windows: each event lands in width/slide buckets
    (Spark expands in-row before the group-by)."""
    win = F.window(F.col(ts_col), width, slide)
    return (events
            .groupBy(win.getField("start").alias("window_start"), F.col(type_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy("window_start", type_col))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id",
               id_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization via lag + running sum of session starts
    — the portable island-detection form (works identically in any SQL
    engine; Structured Streaming swaps in ``session_window``).

    Two windows over the same (user, ts, id) ordering → a single
    shuffle on user_id; both window passes run in one stage."""
    order = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(F.col(ts_col)).over(order)
    new_session = (prev_ts.isNull() |
                   ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us))
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sessions = (events
                     .withColumn("__new", new_session.cast("long"))
                     .withColumn("session_idx", F.sum("__new").over(run)))
    return (with_sessions
            .groupBy(F.col(user_col), F.col("session_idx"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"))
            .orderBy(user_col, "session_idx"))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  ts_col: str = "ts", user_col: str = "user_id",
                  id_col: str = "event_id") -> DataFrame:
    """Per-user session summary built on :func:`sessionize`."""
    sessions = sessionize(events, gap_minutes, ts_col, user_col, id_col)
    dur_s = ((F.unix_micros(F.col("session_end"))
              - F.unix_micros(F.col("session_start"))) / F.lit(1_000_000.0))
    return (sessions
            .groupBy(user_col)
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("n_events").alias("n_events"),
                 F.max(dur_s).alias("max_session_seconds"))
            .orderBy(user_col))


def state_intervals(events: DataFrame, state_col: str = "event_type",
                    key_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id") -> DataFrame:
    """SCD-Type-2-style change tracking: collapse each key's run of
    consecutive identical states into one validity interval —
    (key, version, state, valid_from, valid_to, is_current, n_events),
    where ``valid_to`` is the next interval's start (NULL on the open
    current interval). The dimension-versioning primitive: applied to
    attribute snapshots it builds the slowly-changing dimension the
    reference's reporting dims would need under change capture.

    Same shuffle shape as :func:`sessionize`: both window passes and
    the group-by share one partitioning on the key. Null-safe state
    compare (``eqNullSafe``) so a NULL state forms its own run instead
    of merging into its neighbors'."""
    order = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev_state = F.lag(F.col(state_col)).over(order)
    first_row = F.row_number().over(order) == 1
    changed = (first_row
               | ~F.col(state_col).eqNullSafe(prev_state)).cast("long")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versioned = (events
                 .withColumn("__chg", changed)
                 .withColumn("version", F.sum("__chg").over(run)))
    intervals = (versioned
                 .groupBy(F.col(key_col), F.col("version"))
                 .agg(F.min(state_col).alias("state"),  # constant per run
                      F.min(ts_col).alias("valid_from"),
                      F.count(F.lit(1)).alias("n_events")))
    succ = Window.partitionBy(key_col).orderBy("version")
    valid_to = F.lead("valid_from").over(succ)
    return (intervals
            .withColumn("valid_to", valid_to)
            .withColumn("is_current", valid_to.isNull())
            .select(key_col, F.col("version").cast("long").alias("version"),
                    "state", "valid_from", "valid_to", "is_current",
                    "n_events"))


def user_gap_stats(events: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Per-user inter-event-gap statistics via grouped-map
    ``applyInPandas`` — the Arrow grouped-map form for per-key logic
    that needs the whole group in order (here: sort, diff, moments).

    Scale shape: one shuffle on the group key; each group must fit an
    Arrow batch (per-user event counts do). Gap moments are computed in
    integer microseconds and divided once — deterministic, so the
    DuckDB lag-based oracle hash-matches."""
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        # normalize to integer microseconds regardless of the Arrow
        # timestamp unit the batch arrived with
        micros = pdf[ts_col].astype("datetime64[us]").astype("int64")
        gaps = micros.diff().dropna()
        n = len(pdf)
        return pd.DataFrame({
            "user_id": [pdf[user_col].iloc[0]],
            "n_events": [n],
            "n_gaps": [len(gaps)],
            # exact int sums, one double division, no rounding (Python
            # banker's round vs SQL half-away drifts at boundaries)
            "mean_gap_s": [float(int(gaps.sum())) / len(gaps) / 1e6
                           if len(gaps) else None],
            "max_gap_s": [float(int(gaps.max())) / 1e6
                          if len(gaps) else None],
        })

    return (events.select(user_col, ts_col, id_col)
            .groupBy(user_col)
            .applyInPandas(
                stats,
                "user_id long, n_events long, n_gaps long, "
                "mean_gap_s double, max_gap_s double"))


def click_to_purchase_lag(clicks: DataFrame, purchases: DataFrame,
                          user_col: str = "user_id",
                          ts_col: str = "ts") -> DataFrame:
    """Per-user click→next-purchase lag via COGROUPED ``applyInPandas``:
    both sides of a key arrive together as pandas frames, matched with
    ``merge_asof(direction='forward')`` — the per-key two-stream form
    (conversion funnels, order↔shipment matching).

    Scale shape: one shuffle per side on the key; each user's pair of
    groups must fit an Arrow batch. Integer-microsecond lag math keeps
    the DuckDB forward-ASOF oracle hash-matching."""
    import pandas as pd

    def match(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=["user_id", "n_clicks", "n_matched",
                                         "mean_lag_s"])
        l = l.sort_values(ts_col)
        lm = l[ts_col].astype("datetime64[us]").astype("int64").rename("c_us")
        lf = pd.DataFrame({"c_us": lm})
        if len(r):
            r = r.sort_values(ts_col)
            rf = pd.DataFrame({
                "p_us": r[ts_col].astype("datetime64[us]").astype("int64")})
            merged = pd.merge_asof(lf, rf, left_on="c_us", right_on="p_us",
                                   direction="forward")
            lags = (merged["p_us"] - merged["c_us"]).dropna()
        else:
            lags = pd.Series([], dtype="float64")
        return pd.DataFrame({
            "user_id": [l[user_col].iloc[0]],
            "n_clicks": [len(l)],
            "n_matched": [int(lags.shape[0])],
            # exact int64 sum, ONE double division, NO rounding — float
            # accumulation order (pandas .mean()) and Python's banker's
            # round both drift in the last decimal vs SQL; identical
            # IEEE ops on identical ints are drift-free
            "mean_lag_s": [float(int(lags.sum())) / len(lags) / 1e6
                           if len(lags) else None],
        })

    return (clicks.select(user_col, ts_col).groupBy(user_col)
            .cogroup(purchases.select(user_col, ts_col).groupBy(user_col))
            .applyInPandas(
                match,
                "user_id long, n_clicks long, n_matched long, mean_lag_s double"))


def funnel_steps(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered funnel completion per user: step i counts only when it
    happens strictly AFTER the chosen (earliest-greedy) time of step
    i-1 — the standard product-analytics funnel, not a mere "did all
    types occur" check.

    Greedy-earliest is well-defined and engine-independent: t_0 =
    min ts of step 0; t_i = min ts of step i with ts > t_(i-1).
    Returns (user, t_0..t_{k-1}, steps_completed, converted) for every
    user who reached step 0.

    Scale shape: k filtered scans (each type predicate pushes to the
    parquet reader) and k groupBy/join rounds ALL keyed on the user
    column — one hash partitioning reused end-to-end, no windows, no
    collect_list state. Funnel depth, not event volume, sets the round
    count."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    out = (events.where(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("t_0")))
    for i, s in enumerate(steps[1:], start=1):
        nxt = (events.where(F.col(type_col) == s)
               .select(user_col, F.col(ts_col))
               .join(out.select(user_col, f"t_{i - 1}"), user_col)
               .where(F.col(ts_col) > F.col(f"t_{i - 1}"))
               .groupBy(user_col).agg(F.min(ts_col).alias(f"t_{i}")))
        out = out.join(nxt, user_col, "left")
    completed = F.lit(1)
    for i in range(1, len(steps)):
        completed = completed + F.col(f"t_{i}").isNotNull().cast("int")
    return (out
            .withColumn("steps_completed", completed.cast("long"))
            .withColumn("converted",
                        F.col(f"t_{len(steps) - 1}").isNotNull()))


#: integer day/week arithmetic on epoch micros — engine-independent
#: (DuckDB time_bucket's week origin differs from Spark's window
#: origin, so week cohorts must never go through either built-in).
_US_PER_DAY = 86_400_000_000


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention triangle: users cohorted by first-activity
    week; each (cohort_week, week_offset) cell counts the distinct
    cohort members active that many weeks later, with the retention
    rate against cohort size.

    Weeks are ``epoch_micros div (7 days)`` — pure integer math, so
    the cohort keys are bit-identical across engines (both Spark's
    ``F.window`` and DuckDB's ``time_bucket`` have incompatible week
    origins; neither is used). Shuffle shape: distinct (user, week)
    with map-side combine, a user-keyed min for cohorts, one
    broadcast-able cohort-size join — all equi, fact rows shuffle
    once."""
    week = F.expr(f"unix_micros({ts_col}) div {_US_PER_DAY * 7}")
    active = (events.select(F.col(user_col), week.alias("week")).distinct())
    cohort = active.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    cells = (active.join(cohort, user_col)
             .groupBy("cohort_week",
                      (F.col("week") - F.col("cohort_week"))
                      .alias("week_offset"))
             .agg(F.count_distinct(user_col).alias("n_active")))
    return (cells.join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week", "week_offset", "n_active", "cohort_size",
                    (F.col("n_active").cast("double")
                     / F.col("cohort_size").cast("double"))
                    .alias("retention")))


def hourly_anomalies(events: DataFrame, z_threshold: float = 2.0,
                     ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Volume-anomaly detection: hours whose event count deviates from
    the event-type's mean by ``z_threshold`` standard deviations.

    Moments come from exact integer sums (Σc and Σc² over int64) with
    the float division/sqrt applied once at the end — bit-identical
    across engines, unlike stddev aggregates whose float fold order is
    engine-specific. Shuffle shape: one (type, hour) groupBy with
    map-side combine, then a broadcast of the per-type moment table
    (one row per event type) back onto the hourly counts."""
    win = F.window(F.col(ts_col), "1 hour").getField("start")
    hourly = (events
              .groupBy(F.col(type_col), win.alias("window_start"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    stats = (hourly.groupBy(type_col)
             .agg(F.count(F.lit(1)).alias("n_hours"),
                  F.sum("n_events").alias("s"),
                  F.sum(F.col("n_events") * F.col("n_events")).alias("ss")))
    mean = F.col("s").cast("double") / F.col("n_hours").cast("double")
    var = ((F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n_hours").cast("double"))
           / (F.col("n_hours").cast("double") - F.lit(1.0)))
    stats = stats.select(type_col, mean.alias("mean_events"),
                         F.sqrt(var).alias("sd_events"))
    z = ((F.col("n_events").cast("double") - F.col("mean_events"))
         / F.col("sd_events"))
    return (hourly.join(F.broadcast(stats), type_col)
            .withColumn("z", z)
            .where(F.abs(F.col("z")) >= z_threshold)
            .select(type_col, "window_start", "n_events",
                    "mean_events", "z"))


def transition_matrix(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      type_col: str = "event_type") -> DataFrame:
    """First-order behavior model: counts and row-normalized
    probabilities of consecutive event-type transitions within each
    user's timeline — the Markov-chain summary behind next-action
    prediction and session-flow dashboards.

    One shuffle (the per-user ordering window; the two group-bys that
    follow reuse tiny aggregates). Probabilities divide exact integer
    counts once at the end — bit-identical cross-engine."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = (events
             .select(F.col(user_col),
                     F.lag(F.col(type_col)).over(w).alias("from_type"),
                     F.col(type_col).alias("to_type"))
             .where(F.col("from_type").isNotNull()))
    counts = (steps.groupBy("from_type", "to_type")
              .agg(F.count(F.lit(1)).alias("n_transitions")))
    totals = (counts.groupBy("from_type")
              .agg(F.sum("n_transitions").alias("__row_total")))
    return (counts.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n_transitions",
                    (F.col("n_transitions").cast("double")
                     / F.col("__row_total").cast("double"))
                    .alias("probability")))


def dau_wau(events: DataFrame, user_col: str = "user_id",
            ts_col: str = "ts", window_days: int = 7,
            approx: bool = False, rsd: float = 0.02) -> DataFrame:
    """Daily/rolling-window active users and stickiness (DAU/WAU for
    the 7-day default) per epoch day — the canonical engagement
    metric. WAU(d) counts distinct users active in
    [d-window_days+1, d]: rather than a distinct-over-range window
    (unsupported) or a per-day self-join, each (user, active-day) pair
    explodes map-side into the ``window_days`` rolling days it
    contributes to, then one distinct count per day — shuffle volume
    is window_days× the (user, day) pairs, never user×day×day.
    Integer epoch-day keys (div arithmetic, engine-independent); only
    days with activity are reported.

    ``approx=True`` swaps both distincts for HyperLogLog++
    (``approx_count_distinct`` at ``rsd``) — same policy as
    ``hier_agg_closure_approx``: at 100 TB the exact per-day distinct
    shuffles every (user, day) pair to its day; the sketch merges
    fixed-size registers map-side instead, and a ±2% DAU is
    indistinguishable on a dashboard. Exact mode stays the oracle-able
    default."""
    cd = ((lambda c: F.approx_count_distinct(c, rsd)) if approx
          else F.count_distinct)
    day = F.expr(f"unix_micros({ts_col}) div {86_400_000_000}")
    active = events.select(F.col(user_col).alias("u"),
                           day.alias("d")).distinct()
    dau = active.groupBy(F.col("d").alias("day")).agg(
        cd(F.col("u")).alias("dau"))
    contrib = active.select(
        "u", F.explode(F.sequence(F.col("d"),
                                  F.col("d") + (window_days - 1))).alias("day"))
    wau = contrib.groupBy("day").agg(cd(F.col("u")).alias("wau"))
    return (dau.join(wau, "day")
            .select("day", "dau", "wau",
                    (F.col("dau").cast("double") / F.col("wau").cast("double"))
                    .alias("stickiness")))


def topk_paths(events: DataFrame, k: int = 20, first_n: int = 5,
               user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type", id_col: str = "event_id",
               sep: str = ">") -> DataFrame:
    """Top-k entry journeys: each user's first ``first_n`` events (by
    (ts, event_id) — ties can't reorder) concatenated into a path
    string, counted across users, ranked by popularity.

    Scale shape: the stream is cut to each user's first ``first_n``
    events with a ``row_number`` window BEFORE anything aggregates —
    the window sort spills, so a bot user with millions of events
    costs disk, not executor memory (a collect_list-then-slice would
    buffer that user's entire history in one array). The per-user
    group-by reuses the window's hash partitioning (no second
    event-stream shuffle), and its arrays are ≤ first_n elements by
    construction. The top-k cut is an ordered ``limit`` — Spark plans
    it as TakeOrderedAndProject (per-partition top-k heaps merged on
    the driver), never a single-task sort — so a high-cardinality
    ``type_col`` (URLs, not a small event alphabet) cannot funnel the
    path-count frame through one partition; only the ≤ k survivors see
    a rank window. Tie-break is (n_users DESC, path ASC), fully
    deterministic.
    """
    order = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col))
    firsts = (events
              .withColumn("__rn", F.row_number().over(order))
              .where(F.col("__rn") <= first_n))
    per_user = (firsts
                .groupBy(F.col(user_col).alias("__u"))
                .agg(F.array_sort(F.collect_list(F.struct(
                    F.col("__rn").alias("r"),
                    F.col(type_col).alias("e")))).alias("__a"))
                .select(F.concat_ws(
                    sep, F.transform(F.col("__a"), lambda s: s["e"]))
                    .alias("path")))
    counts = per_user.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_users"))
    top = counts.orderBy(F.desc("n_users"), F.asc("path")).limit(k)
    w = Window.orderBy(F.desc("n_users"), F.asc("path"))
    return (top
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .select("rank", "path", "n_users"))


def attribution(events: DataFrame, conversion_type: str = "purchase",
                touch_types: tuple = ("click", "view"),
                lookback_days: int = 7,
                user_col: str = "user_id", ts_col: str = "ts",
                type_col: str = "event_type", id_col: str = "event_id",
                value_col: str = "value") -> DataFrame:
    """Last-touch attribution: credit each conversion to the user's
    most recent preceding touch event (within ``lookback_days``), then
    roll conversions up per channel — the marketing-analytics question
    ("which channel drove the purchases") and, in a training-data
    pipeline, the provenance question ("which acquisition path did
    this sample's user come through").

    Scale shape: ONE spillable fill-forward window per user — ``last(
    touch, ignorenulls=True)`` over (ts, id) ``ROWS UNBOUNDED
    PRECEDING`` carries the latest touch to every row in a single
    ordered pass (no self-join, no as-of join shuffle; the window's
    hash partitioning on user is the only event-stream exchange), then
    conversions filter in-row and a narrow (channel, value, lag)
    projection feeds one map-side-combinable aggregate. Determinism:
    window ordered on (ts, id) so same-instant ties can't reorder; a
    touch at the conversion's own timestamp with a smaller id counts
    as preceding, in both engines.

    Returns (channel, n_conversions, sum_value, sum_lag_us) ordered by
    channel, with channel='none' for conversions whose latest touch is
    missing or older than the lookback. sum_value is DECIMAL-summed
    then cast (float sum order is engine-dependent); lag is exact
    integer microseconds."""
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    is_touch = F.col(type_col).isin(list(touch_types))
    touch = F.last(
        F.when(is_touch, F.struct(F.col(ts_col).alias("t"),
                                  F.col(type_col).alias("ch"))),
        ignorenulls=True).over(w)
    conv = (events
            .withColumn("__touch", touch)
            .where(F.col(type_col) == F.lit(conversion_type)))
    lag_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.col("__touch.t"))
    within = (F.col("__touch").isNotNull()
              & (lag_us <= lookback_days * 86_400_000_000))
    channel = F.when(within, F.col("__touch.ch")).otherwise(F.lit("none"))
    return (conv.select(channel.alias("channel"),
                        F.col(value_col).alias("__v"),
                        F.when(within, lag_us).alias("__lag"))
            .groupBy("channel")
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 F.sum(F.col("__v").cast("decimal(18,3)")).cast("double")
                 .alias("sum_value"),
                 F.sum("__lag").cast("long").alias("sum_lag_us"))
            .orderBy("channel"))


def rfm_segments(events: DataFrame, conversion_type: str = "purchase",
                 recent_days: int = 7, frequent_min: int = 5,
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 value_col: str = "value") -> DataFrame:
    """RFM segmentation: per user, Recency (whole days since their
    last conversion, anchored at the corpus's max event time so the
    answer is reproducible, not wall-clock-dependent), Frequency
    (conversion count) and Monetary (decimal-summed value), plus the
    classic four-way segment by fixed thresholds — champion (recent &
    frequent), loyal (frequent), recent, dormant. Fixed thresholds,
    not quantiles, deliberately: quantile cut-offs over a per-user
    frame would need a global rank (the single-task sort this module
    refuses) and make every user's label depend on every other user.

    Scale shape: one scalar max (the anchor, folded as a literal) and
    one map-side-combinable groupBy(user) over conversions only —
    narrow rows, single shuffle. Integer day arithmetic; no float
    folds besides the final decimal→double cast.

    Returns (user_id, recency_days, frequency, monetary, segment)."""
    anchor_us = events.agg(
        F.max(F.unix_micros(F.col(ts_col)))).collect()[0][0]
    if anchor_us is None:
        raise ValueError("rfm_segments: no events")
    conv = events.where(F.col(type_col) == F.lit(conversion_type))
    per_user = (conv.groupBy(F.col(user_col).cast("long")
                             .alias("user_id"))
                .agg(F.max(F.unix_micros(F.col(ts_col))).alias("__last"),
                     F.count(F.lit(1)).alias("frequency"),
                     F.sum(F.col(value_col).cast("decimal(18,3)"))
                     .cast("double").alias("monetary")))
    recency = F.expr(f"({anchor_us} - __last) div 86400000000")
    recent = recency <= recent_days
    frequent = F.col("frequency") >= frequent_min
    segment = (F.when(recent & frequent, "champion")
               .when(frequent, "loyal")
               .when(recent, "recent")
               .otherwise("dormant"))
    return (per_user.select("user_id",
                            recency.cast("long").alias("recency_days"),
                            F.col("frequency").cast("long")
                            .alias("frequency"),
                            "monetary", segment.alias("segment"))
            .orderBy("user_id"))
