"""Event-stream analytics: ordered funnel and retention cohorts.

Batch twins of the streaming surface (streaming/stateful.py sessionize),
shaped for the 100 TB case: the funnel's sequential state machine runs
as ONE user-keyed shuffle whose per-user scan is a JVM higher-order
`aggregate` over the time-sorted event array (no Python, no per-stage
re-shuffle — a K-step funnel done as K conditional-min joins would
shuffle the event stream K times); retention is two map-side-combinable
aggregates meeting on the user key.

Per-user event arrays are bounded by per-user activity, not corpus
size, so collect_list here is the per-group state any stateful funnel
engine carries — it is NOT a driver collect.
"""

from __future__ import annotations

import functools
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def funnel_stages(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """Strictly-ordered funnel depth per user, aggregated to
    (stage, n_users).

    Semantics (the greedy scan == sequential conditional mins): stage k
    completes at the FIRST event of type steps[k] with ts STRICTLY
    after the stage-(k-1) completion time; a user's depth is the number
    of completed stages. Equal timestamps never advance a stage in
    either engine, so sort-tie order is irrelevant and the result is
    deterministic.

    One shuffle: groupBy(user) -> array_sort -> F.aggregate state
    machine (struct accumulator {stage, t}), entirely JVM-side."""
    steps = steps or FUNNEL_STEPS
    per_user = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs")
    )
    return (
        per_user.select(_funnel_depth(steps).alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


def _funnel_depth(steps: list[str]) -> F.Column:
    """Funnel depth over a time-sorted ``evs`` struct array — the
    greedy JVM aggregate state machine shared by funnel_stages and
    cohort_funnel."""
    def advance(acc, e):
        conds = [
            (acc["stage"] == F.lit(k))
            & (e["event_type"] == F.lit(s))
            & ((F.lit(k == 0)) | (e["ts"] > acc["t"]))
            for k, s in enumerate(steps)
        ]
        hit = functools.reduce(or_, conds)
        return F.struct(
            F.when(hit, acc["stage"] + 1).otherwise(acc["stage"]).alias("stage"),
            F.when(hit, e["ts"]).otherwise(acc["t"]).alias("t"),
        )

    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("t")
    )
    return F.aggregate("evs", init, advance)["stage"]


def cohort_funnel(events: DataFrame, steps: list[str] | None = None
                  ) -> DataFrame:
    """Funnel depth crossed with acquisition cohort: every user's
    strictly-ordered funnel stage (the funnel_stages state machine,
    identical semantics) broken out by the ISO week of their first
    event — the "did onboarding quality change over time" cut of the
    funnel. The cohort key comes from the SAME per-user groupBy that
    builds the event array, so this is still exactly one user-keyed
    shuffle plus a bounded rollup. Returns
    (cohort_week, stage, n_users)."""
    steps = steps or FUNNEL_STEPS
    per_user = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs"),
        F.date_format(F.date_trunc("week", F.min("ts")), "yyyy-MM-dd")
        .alias("cohort_week"),
    )
    return (
        per_user.select("cohort_week", _funnel_depth(steps).alias("stage"))
        .groupBy("cohort_week", "stage")
        .agg(F.count("*").alias("n_users"))
    )


def inter_event_bands(events: DataFrame) -> DataFrame:
    """Inter-arrival-time profile: per event type, the distribution of
    whole-second gaps since the same user's previous event (any type)
    on the exact power-of-two band lattice (sub-second gaps in band
    -1; a user's first event doesn't contribute). The queueing-shape
    audit behind bot_bursts' fixed threshold. One user-keyed window
    pass, bounded rollup. Returns
    (event_type, gap_band, n_events, sum_gap_s)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    band = F.when(
        F.col("gap_s") > 0,
        (F.length(F.bin(F.col("gap_s"))) - 1).cast("int")
    ).otherwise(F.lit(-1))
    return (
        events.select("event_type", gap.alias("gap_s"))
        .filter(F.col("gap_s").isNotNull())
        .select("event_type", band.alias("gap_band"), "gap_s")
        .groupBy("event_type", "gap_band")
        .agg(F.count("*").alias("n_events"), F.sum("gap_s").alias("sum_gap_s"))
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention triangle: users cohorted by the ISO week of
    their first event; one output row per (cohort_week, week_offset)
    with the count of cohort users active that week.

    Two shuffles, both map-side combinable: per-user first-event min,
    and the distinct (user, week) activity set; they meet on the user
    key (co-partitioned hash join), then a compact (cohort, offset)
    aggregate. Weeks are Monday-truncated in both engines and the
    offset is exact integer day-difference / 7."""
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("c0")
    )
    act = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    j = act.join(first, "user_id")
    return (
        j.select(
            F.date_format("c0", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.to_date("w"), F.to_date("c0")) / 7)
            .cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's
    time-ordered event stream: one row per (prev_type, event_type)
    with the transition count. One shuffle+sort (the window's user
    partitioning); counts are pure integers. Stream starts emit
    prev_type='(start)' so row counts reconcile exactly with the
    event table."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.coalesce(F.lag("event_type").over(w), F.lit("(start)"))
    return (
        events.select(prev.alias("prev_type"), "event_type")
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_transitions"))
    )


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM segmentation with fixed (engine-shared) thresholds: per user
    recency = whole days since their last purchase relative to the
    corpus max timestamp, frequency = purchase count, monetary = exact
    fixed-point cents; users bucket into the 2x2x2 grid (recent <= 30
    days, frequent >= 10, high-value >= 500.00) and the output counts
    each segment. Two map-side-combinable aggregates (per-user rollup,
    segment rollup) plus one broadcast scalar (corpus max ts)."""
    pur = events.filter(F.col("event_type") == "purchase")
    mx = pur.agg(F.max("ts").alias("mx"))
    per = pur.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("freq"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")
              ).alias("monetary_c"),
    )
    j = per.crossJoin(F.broadcast(mx))
    rec_days = F.floor(
        (F.unix_timestamp("mx") - F.unix_timestamp("last_ts"))
        / F.lit(86400)).cast("long")
    seg = j.select(
        (rec_days <= 30).cast("int").alias("recent"),
        (F.col("freq") >= 10).cast("int").alias("frequent"),
        (F.col("monetary_c") >= 50000).cast("int").alias("high_value"),
        "monetary_c",
    )
    return seg.groupBy("recent", "frequent", "high_value").agg(
        F.count("*").alias("n_users"),
        F.sum("monetary_c").alias("monetary_c_sum"),
    )


def session_durations(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Session-duration distribution: sessions split at > gap_s idle
    (the same rule as the sessionize query and the streaming twin),
    duration = last-minus-first event in WHOLE SECONDS (exact integer),
    histogrammed by whole minutes. One user-keyed window pass + one
    bounded rollup — the per-user window is the standard sessionize
    shuffle, never a global sort. Returns
    (duration_min, n_sessions, sum_events)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(lag_ts) > gap_s),
        1).otherwise(0)
    sid = F.sum(new_s).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0))
    per_session = (
        events.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg((F.unix_timestamp(F.max("ts"))
              - F.unix_timestamp(F.min("ts"))).alias("dur_s"),
             F.count("*").alias("n_events"))
    )
    return (
        per_session
        .select(F.floor(F.col("dur_s") / 60).cast("int")
                .alias("duration_min"), "n_events")
        .groupBy("duration_min")
        .agg(F.count("*").alias("n_sessions"),
             F.sum("n_events").alias("sum_events"))
    )


def user_ltv_bands(events: DataFrame) -> DataFrame:
    """User lifetime-value distribution by power-of-two cents band —
    floor(log2(cents)) computed exactly from the binary expansion (no
    float log), the same lattice vocab_zipf uses. Two map-side-
    combinable aggregates (per-user cents rollup, band rollup); cents
    are exact fixed-point BIGINTs so the per-user sum is order-
    independent. Users with zero purchase value land in band -1.
    Returns (ltv_band, n_users, sum_cents)."""
    per_user = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
             .alias("cents"))
    )
    band = F.when(
        F.col("cents") > 0, (F.length(F.bin(F.col("cents"))) - 1).cast("int")
    ).otherwise(F.lit(-1))
    return (
        per_user.select(band.alias("ltv_band"), "cents")
        .groupBy("ltv_band")
        .agg(F.count("*").alias("n_users"), F.sum("cents").alias("sum_cents"))
    )


def bot_bursts(events: DataFrame, window_s: int = 10, k: int = 3) -> DataFrame:
    """Burst (bot-likeness) profile: an event is a *burst point* when it
    and the (k-1)-th previous event of the same user are <= window_s
    seconds apart (i.e. >= k events inside a window_s-second span). The
    output histograms users by their burst-point count — the screening
    pass a crawl/abuse pipeline runs before rate-limiting or dropping
    automated traffic.

    One user-keyed window pass (lag(ts, k-1)) whose sort shuffle is then
    REUSED by the per-user conditional sum (same partitioning key), then
    a bounded histogram rollup. Whole-second arithmetic throughout, so
    both engines agree exactly. Returns (n_bursts, n_users)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts", k - 1).over(w)
    flag = F.when(
        prev.isNotNull()
        & (F.unix_timestamp("ts") - F.unix_timestamp(prev) <= window_s),
        1).otherwise(0)
    per_user = (
        events.select("user_id", flag.alias("b"))
        .groupBy("user_id")
        .agg(F.sum("b").alias("n_bursts"))
    )
    return per_user.groupBy("n_bursts").agg(F.count("*").alias("n_users"))


def weekly_stickiness(events: DataFrame) -> DataFrame:
    """DAU/WAU engagement ("stickiness") per ISO week: WAU = distinct
    users active in the Monday-truncated week, sum_dau = the sum of the
    week's daily distinct-user counts, and stickiness_fp = the exact
    fixed-point mean-DAU-per-WAU ratio sum_dau * 1e6 // (n_days * wau).

    Two distinct-sets (user x day, user x week), each ONE map-side-
    combinable shuffle on a compact key; the day rollup re-aggregates
    into its week so the two legs meet on the week key (bounded
    cardinality -> broadcastable join at any corpus size). Returns
    (week, wau, n_days, sum_dau, stickiness_fp)."""
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    week = F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
    dau = (
        events.select(week.alias("week"), day.alias("day"), "user_id")
        .distinct()
        .groupBy("week", "day")
        .agg(F.count("*").alias("dau"))
        .groupBy("week")
        .agg(F.count("*").alias("n_days"), F.sum("dau").alias("sum_dau"))
    )
    wau = (
        events.select(week.alias("week"), "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count("*").alias("wau"))
    )
    j = dau.join(wau, "week")
    fp = F.expr("(sum_dau * 1000000) div (n_days * wau)")
    return j.select("week", "wau", "n_days", "sum_dau",
                    fp.alias("stickiness_fp"))


def purchase_attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution: each purchase is attributed to the
    immediately preceding event (any type) of the same user; purchases
    with no prior event attribute to '(none)'. Output: per prior type,
    the purchase count and exact cents revenue.

    One user-keyed window sort (the sessionize shuffle), then a bounded
    rollup — the standard "which interaction drove the sale" report,
    kept exact by fixed-point cents. Returns
    (prior_type, n_purchases, cents_sum)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior = F.coalesce(F.lag("event_type").over(w), F.lit("(none)"))
    return (
        events.select(
            "event_type",
            prior.alias("prior_type"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        )
        .filter(F.col("event_type") == "purchase")
        .groupBy("prior_type")
        .agg(F.count("*").alias("n_purchases"),
             F.sum("cents").alias("cents_sum"))
    )


def hourly_error_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day error-rate profile: per hour 0-23, total events,
    error events, and the exact fixed-point error rate
    n_errors * 1e6 // n_events. One map-side-combinable aggregate over
    a 24-row output — the monitoring rollup shape (conditional count
    inside the same pass, never a second scan). Returns
    (hour_of_day, n_events, n_errors, error_rate_fp)."""
    g = (
        events.select(
            F.hour("ts").cast("int").alias("hour_of_day"),
            (F.col("event_type") == "error").cast("long").alias("is_err"),
        )
        .groupBy("hour_of_day")
        .agg(F.count("*").alias("n_events"), F.sum("is_err").alias("n_errors"))
    )
    fp = F.expr("(n_errors * 1000000) div n_events")
    return g.select("hour_of_day", "n_events", "n_errors",
                    fp.alias("error_rate_fp"))


def conversion_lag_bands(events: DataFrame) -> DataFrame:
    """Signup-to-purchase conversion lag distribution by power-of-two
    seconds band (the funnel's "time to convert" companion): per user,
    first signup, then the first purchase STRICTLY after it; lag in
    whole seconds bands as floor(log2(lag)) from the exact binary
    expansion, sub-second lags in band -1. Two user-keyed aggregates +
    one user-keyed join. Returns (lag_band, n_users, sum_lag_s)."""
    su = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t0"))
    )
    pu = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"), F.min("t0").alias("t0"))
    )
    lag = (F.unix_timestamp("t1") - F.unix_timestamp("t0"))
    band = F.when(lag > 0, (F.length(F.bin(lag)) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        pu.select(band.alias("lag_band"), lag.alias("lag_s"))
        .groupBy("lag_band")
        .agg(F.count("*").alias("n_users"), F.sum("lag_s").alias("sum_lag_s"))
    )

def funnel_stage_lags(events: DataFrame, steps: list[str] | None = None
                      ) -> DataFrame:
    """Time-to-convert per funnel transition: for every user who
    completes stage k, the whole-second lag from their stage-(k-1)
    completion to stage-k completion (stage_pair 1 = signup->view,
    2 = view->click, 3 = click->purchase), with the exact fixed-point
    mean lag. Same greedy state machine as funnel_stages — the
    accumulator additionally records each hit's timestamp lag — so
    still exactly ONE user-keyed shuffle. Returns
    (stage_pair, n_users, sum_lag_s, mean_lag_fp)."""
    steps = steps or FUNNEL_STEPS
    per_user = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs")
    )
    n = len(steps)

    def advance(acc, e):
        conds = [
            (acc["stage"] == F.lit(k))
            & (e["event_type"] == F.lit(s))
            & ((F.lit(k == 0)) | (e["ts"] > acc["t"]))
            for k, s in enumerate(steps)
        ]
        hit = functools.reduce(or_, conds)
        lag = F.unix_timestamp(e["ts"]) - F.unix_timestamp(acc["t"])
        lag_fields = [
            F.when(
                conds[k], lag
            ).otherwise(acc[f"l{k}"]).alias(f"l{k}")
            for k in range(1, n)
        ]
        return F.struct(
            F.when(hit, acc["stage"] + 1).otherwise(acc["stage"]).alias("stage"),
            F.when(hit, e["ts"]).otherwise(acc["t"]).alias("t"),
            *lag_fields,
        )

    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("t"),
        *[F.lit(None).cast("long").alias(f"l{k}") for k in range(1, n)],
    )
    st = per_user.select(F.aggregate("evs", init, advance).alias("a"))
    pairs = st.select(F.explode(F.array(*[
        F.struct(F.lit(k).alias("stage_pair"),
                 F.col("a")[f"l{k}"].alias("lag_s"))
        for k in range(1, n)
    ])).alias("p")).select("p.stage_pair", "p.lag_s") \
        .filter(F.col("lag_s").isNotNull())
    return (
        pairs.groupBy("stage_pair")
        .agg(F.count("*").alias("n_users"), F.sum("lag_s").alias("sum_lag_s"),
             F.expr("(sum(lag_s) * 1000000) div count(*)")
             .alias("mean_lag_fp"))
    )


def session_entry_exit(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Session entry/exit matrix: sessionize on the same 30-minute
    inactivity gap as sessionize_events, then cross-tab each session's
    first event type against its last. The landing-page ->
    abandonment-point audit. The session id is a running sum over the
    user-keyed sort; the per-(user, session) first/last picks and the
    session rollup all reuse hash(user_id) partitioning (Spark's
    ClusteredDistribution is satisfied by the subset key), so the whole
    pipeline is ONE user-keyed exchange plus the bounded matrix rollup.
    Returns (entry_type, exit_type, n_sessions, sum_events)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(lag_ts) > gap_s),
        1).otherwise(0)
    e = (events.withColumn("new_session", new_s)
         .withColumn("sid", F.sum("new_session").over(w)))
    ws = Window.partitionBy("user_id", "sid")
    ra = F.row_number().over(ws.orderBy("ts", "event_id"))
    rd = F.row_number().over(ws.orderBy(F.desc("ts"), F.desc("event_id")))
    m = e.select("user_id", "sid", "event_type",
                 ra.alias("ra"), rd.alias("rd"))
    per = m.groupBy("user_id", "sid").agg(
        F.max(F.when(F.col("ra") == 1, F.col("event_type")))
        .alias("entry_type"),
        F.max(F.when(F.col("rd") == 1, F.col("event_type")))
        .alias("exit_type"),
        F.count("*").alias("n_ev"))
    return (
        per.groupBy("entry_type", "exit_type")
        .agg(F.count("*").alias("n_sessions"),
             F.sum("n_ev").alias("sum_events"))
    )


def event_value_bands(events: DataFrame) -> DataFrame:
    """Per-event-type value distribution on power-of-two CENT bands:
    value lands on the exact cent lattice (floor(v*100 + 0.5), one
    deterministic IEEE multiply+floor in both engines), then
    log2-banded — the order-of-magnitude revenue/latency profile that
    reads skew without an expensive exact percentile. Zero shuffles
    before the bounded (type, band) rollup. Returns
    (event_type, value_band, n_events, sum_cents)."""
    vc = F.floor(F.col("value").cast("double") * F.lit(100.0)
                 + F.lit(0.5)).cast("long")
    band = F.when(F.col("vc") > 0,
                  (F.length(F.bin(F.col("vc"))) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        events.select("event_type", vc.alias("vc"))
        .select("event_type", band.alias("value_band"), "vc")
        .groupBy("event_type", "value_band")
        .agg(F.count("*").alias("n_events"), F.sum("vc").alias("sum_cents"))
    )


def transition_entropy(events: DataFrame) -> DataFrame:
    """Shannon entropy of each from-state's next-event distribution
    over the first-order Markov transition counts event_transitions
    builds — near-zero entropy states are deterministic flows (bot
    loops, forced redirects), high-entropy states are genuine choice
    points. Reuses event_transitions' one shuffle+sort; the per-term
    fixed-point (floor(p*ln p*1e6 + 0.5) BIGINT, order-independent
    negated sum) is the same cross-engine contract as
    textops.token_entropy. Returns
    (prev_type, n_transitions, n_targets, entropy_fp)."""
    c = event_transitions(events)
    t = c.groupBy("prev_type").agg(F.sum("n_transitions").alias("n"))
    p = F.col("n_transitions").cast("double") / F.col("n").cast("double")
    term = F.floor(p * F.log(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        c.join(t, "prev_type")
        .select("prev_type", "n", term.alias("tfp"))
        .groupBy("prev_type")
        .agg(F.max("n").alias("n_transitions"),
             F.count("*").alias("n_targets"),
             (-F.sum("tfp")).alias("entropy_fp"))
    )


def activity_deciles(events: DataFrame) -> DataFrame:
    """Whale-concentration curve: rank users by activity and report,
    at each user-count decile d (top 10%, top 20%, ...), the activity
    floor of that decile and the cumulative share of ALL events it
    owns — the Lorenz/Gini read ("top 10% of users generate X% of
    traffic"). Scale shape mirrors geostats.hypsometric_deciles: the
    per-user counts collapse to the COUNT-DOMAIN histogram (one row
    per distinct activity level — bounded by max per-user activity,
    not the user count), so the ordered decile window is
    single-partition-bounded and cheap at any event volume. Returns
    (decile, activity_floor, n_users_cum, events_cum, share_fp)."""
    per = events.groupBy("user_id").agg(F.count("*").alias("c"))
    h = per.groupBy("c").agg(F.count("*").alias("nu"))
    w = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cm = h.select(
        "c",
        F.sum("nu").over(w).alias("cum_users"),
        F.sum(F.col("nu") * F.col("c")).over(w).alias("cum_events"),
        F.sum("nu").over(wall).alias("tot_users"),
        F.sum(F.col("nu") * F.col("c")).over(wall).alias("tot_events"))
    d = cm.select(
        "*",
        F.explode(F.array(*[F.lit(i) for i in range(1, 11)]))
        .alias("decile"))
    sat = d.filter(F.col("cum_users") * 10 >= F.col("decile")
                   * F.col("tot_users"))
    return (
        sat.groupBy("decile")
        .agg(F.max("c").alias("activity_floor"),
             F.min("cum_users").alias("n_users_cum"),
             F.min("cum_events").alias("events_cum"),
             F.max("tot_events").alias("te"))
        .select("decile", "activity_floor", "n_users_cum", "events_cum",
                F.expr("(events_cum * 1000000) div te").alias("share_fp"))
    )


def engagement_ltv_matrix(events: DataFrame) -> DataFrame:
    """First-week engagement vs lifetime purchases: each user's event
    count inside their first 7 days crossed with their lifetime
    purchase count, both on power-of-two bands — the activation-to-LTV
    matrix growth teams read before changing onboarding. The first-ts
    window and the per-user conditional rollup share hash(user_id), so
    the whole pipeline is ONE user-keyed exchange plus the bounded
    matrix rollup. Returns
    (week1_band, purchase_band, n_users, sum_purchases)."""
    w = Window.partitionBy("user_id")
    f0 = F.min("ts").over(w)
    e = events.withColumn("f0", f0)
    per = e.groupBy("user_id").agg(
        F.sum((F.unix_timestamp("ts") - F.unix_timestamp("f0")
               < 7 * 86400).cast("long")).alias("w1"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("np"))
    w1_band = (F.length(F.bin(F.col("w1"))) - 1).cast("int")
    p_band = F.when(F.col("np") > 0,
                    (F.length(F.bin(F.col("np"))) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        per.select(w1_band.alias("week1_band"), p_band.alias("purchase_band"),
                   "np")
        .groupBy("week1_band", "purchase_band")
        .agg(F.count("*").alias("n_users"), F.sum("np").alias("sum_purchases"))
    )


def value_median_by_type(events: DataFrame) -> DataFrame:
    """Exact per-type value median on the cent lattice: lower and
    upper medians (equal when the count is odd) read off the
    CENT-DOMAIN histogram — one row per distinct cent value per type,
    bounded by the value domain, not the event count, so the per-type
    ordered window is cheap at any volume (the grouped twin of the
    hypsometric/activity decile scans; same bounded-domain contract).
    This is the exact-percentile aggregate shape the raster side's
    zonal_median provides, on the events table. Returns
    (event_type, n_events, median_lo_cents, median_hi_cents)."""
    vc = F.floor(F.col("value").cast("double") * F.lit(100.0)
                 + F.lit(0.5)).cast("long")
    h = (events.select("event_type", vc.alias("vc"))
         .groupBy("event_type", "vc").agg(F.count("*").alias("c")))
    w = Window.partitionBy("event_type").orderBy("vc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("event_type")
    cm = h.select("event_type", "vc",
                  F.sum("c").over(w).alias("cum"),
                  F.sum("c").over(wt).alias("n"))
    return (
        cm.groupBy("event_type")
        .agg(F.max("n").alias("n_events"),
             F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"),
                          F.col("vc"))).alias("median_lo_cents"),
             F.min(F.when(F.col("cum") >= F.expr("n div 2 + 1"),
                          F.col("vc"))).alias("median_hi_cents"))
    )


def dense_hourly_counts(events: DataFrame) -> DataFrame:
    """Calendar densification audit: build the COMPLETE hour spine
    from the corpus min to max timestamp (sequence + explode — no
    driver loop), left-join hourly event counts per type onto it, and
    report per type how many spine hours are dead (zero events) vs
    live, with the exact event total — the gap profile a monitoring
    pipeline needs before alerting on "no data this hour" (a sparse
    groupBy alone cannot see hours that never appear). The spine is
    bounded by the time range (hours), not the event count; counts are
    one hour-keyed partial agg. Returns
    (event_type, n_hours, dead_hours, n_events)."""
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour")))
        .alias("h"))
    types = events.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    cnt = (events.select(F.date_trunc("hour", F.col("ts")).alias("h"),
                         "event_type")
           .groupBy("h", "event_type").agg(F.count("*").alias("c")))
    j = grid.join(cnt, ["h", "event_type"], "left")
    return (
        j.select("event_type",
                 F.coalesce("c", F.lit(0).cast("long")).alias("c"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_hours"),
             F.sum((F.col("c") == 0).cast("long")).alias("dead_hours"),
             F.sum("c").alias("n_events"))
    )


def rolling_wau(events: DataFrame) -> DataFrame:
    """Rolling 7-day active users: for every activity day d, the count
    of distinct users active in (d-6 .. d] — the trailing-window WAU
    curve (weekly_stickiness uses fixed calendar weeks; this is the
    sliding version product dashboards plot). Exact-distinct over a
    sliding window without a window function: the (user, day) distinct
    activity set fans out to its <= 7 covered window days and a second
    distinct collapses multi-day users per window — both shuffles are
    hash-keyed and the fan-out factor is the window length, never the
    event count. Days with no activity in their trailing week never
    appear (censused by dense_hourly_counts' spine trick if needed).
    Output is day-bounded; the census rolls it up to power-of-two WAU
    bands for a bounded result: (wau_band, n_days, sum_wau)."""
    ud = events.select(
        "user_id", F.to_date("ts").alias("d")).distinct()
    fan = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"),
                             F.date_add(F.col("d"), 6))).alias("wd"))
    wau = (fan.distinct()
           .groupBy("wd").agg(F.count("*").alias("wau")))
    # keep only window-end days that themselves saw activity (the
    # dashboard x-axis), matching the oracle's semantics exactly
    days = ud.select("d").distinct().withColumnRenamed("d", "wd")
    w = wau.join(days, "wd")
    band = (F.length(F.bin(F.col("wau"))) - 1).cast("int")
    return (
        w.select(band.alias("wau_band"), "wau")
        .groupBy("wau_band")
        .agg(F.count("*").alias("n_days"), F.sum("wau").alias("sum_wau"))
    )


def survival_table(events: DataFrame) -> DataFrame:
    """Kaplan-Meier ingredients for the signup -> purchase transition
    with RIGHT-CENSORING — the survival-analysis question funnels and
    lag bands can't answer: users who haven't purchased YET are not
    failures, they are censored at the end of observation.  Per user:
    duration = days from first signup to first purchase AT-OR-AFTER
    signup (event) or to the global last-event day (censored).  Output
    is the classic life table, one row per day since signup:
    (day, n_at_risk, n_events, n_censored), where n_at_risk(d) counts
    users whose observed duration >= d — so the KM curve reconstructs
    exactly as S(d) = prod_{d' <= d} (1 - n_events(d')/n_at_risk(d')),
    while the table itself stays all-integer (deterministic vs the
    oracle, no float product).

    Scale shape: two user-keyed shuffles (first-signup agg and the
    signup x purchase pair agg), one broadcast scalar (global end
    day), a day-spine sequence+explode, and the suffix-sum window —
    which orders by the DAY DOMAIN (observation span in days), never
    by user or event count, so the single-partition window is bounded
    by calendar length (the documented bounded-domain window
    contract, aggregates.py:69)."""
    s = (events.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"))
    firstp = (s.join(p, "user_id")
              .filter(F.col("p_ts") >= F.col("s_ts"))
              .groupBy("user_id").agg(F.min("p_ts").alias("fp_ts")))
    end = events.agg(F.max(F.to_date("ts")).alias("end_day"))
    per_user = (s.join(firstp, "user_id", "left")
                .crossJoin(F.broadcast(end))
                .select(
                    F.when(F.col("fp_ts").isNotNull(),
                           F.datediff(F.to_date("fp_ts"),
                                      F.to_date("s_ts"))).alias("ev_day"),
                    F.datediff("end_day",
                               F.to_date("s_ts")).alias("c_day")))
    dur = per_user.select(
        F.coalesce("ev_day", "c_day").alias("day"),
        F.col("ev_day").isNotNull().cast("long").alias("is_event"))
    arr = dur.groupBy("day").agg(
        F.count("*").alias("n_arrived"),
        F.sum("is_event").alias("n_events"))
    spine = (dur.agg(F.max("day").alias("mx"))
             .select(F.explode(
                 F.sequence(F.lit(0), F.col("mx"))).alias("day")))
    j = (spine.join(arr, "day", "left")
         .select("day",
                 F.coalesce("n_arrived", F.lit(0)).alias("n_arrived"),
                 F.coalesce("n_events", F.lit(0)).alias("n_events")))
    w = Window.orderBy(F.desc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return j.select(
        F.col("day").cast("int").alias("day"),
        F.sum("n_arrived").over(w).alias("n_at_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("n_arrived") - F.col("n_events")).cast("long")
        .alias("n_censored"))


def value_mad_by_type(events: DataFrame) -> DataFrame:
    """Exact per-type median absolute deviation on the cent lattice —
    the robust dispersion twin of value_median_by_type: pass 1 reads
    the lower median off the cent-domain histogram, pass 2 folds the
    SAME histogram around it (|cents - median| re-histogram, still
    value-domain-bounded) and reads the lower/upper MAD off that.
    The per-type median table is a handful of rows, so the fold is a
    broadcast join; both ordered windows run over the bounded value
    domain, never the event count.  Returns
    (event_type, n_events, median_cents, mad_lo_cents, mad_hi_cents)."""
    vc = F.floor(F.col("value").cast("double") * F.lit(100.0)
                 + F.lit(0.5)).cast("long")
    h = (events.select("event_type", vc.alias("vc"))
         .groupBy("event_type", "vc").agg(F.count("*").alias("c")))
    w = Window.partitionBy("event_type").orderBy("vc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("event_type")
    cm = h.select("event_type", "vc", "c",
                  F.sum("c").over(w).alias("cum"),
                  F.sum("c").over(wt).alias("n"))
    med = (cm.groupBy("event_type")
           .agg(F.max("n").alias("n_events"),
                F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"),
                             F.col("vc"))).alias("med")))
    dh = (h.join(F.broadcast(med), "event_type")
          .select("event_type", "n_events",
                  F.abs(F.col("vc") - F.col("med")).alias("dv"),
                  "c", "med")
          .groupBy("event_type", "n_events", "med", "dv")
          .agg(F.sum("c").alias("c")))
    w2 = Window.partitionBy("event_type").orderBy("dv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cm2 = dh.select("event_type", "n_events", "med", "dv",
                    F.sum("c").over(w2).alias("cum"))
    return (cm2.groupBy("event_type")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("med").alias("median_cents"),
                 F.min(F.when(
                     F.col("cum") >= F.expr("(n_events + 1) div 2"),
                     F.col("dv"))).alias("mad_lo_cents"),
                 F.min(F.when(
                     F.col("cum") >= F.expr("n_events div 2 + 1"),
                     F.col("dv"))).alias("mad_hi_cents")))
