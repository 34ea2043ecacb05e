"""Randomized property tests for the round-4 event/stat operators:
each Spark result is checked against an independent pure-Python
reference on small generated event streams (deterministic seeds via
splitmix-style hashing — no RNG state, reproducible run-to-run).
These catch state-machine/window edge cases the fixture's one
distribution can't (ties, single-event users, all-in-one-session,
empty stages)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from remotior_sensus_spark.operators import events as ev


TYPES = ["signup", "view", "click", "purchase", "error"]
T0 = dt.datetime(2020, 1, 1)


def _mk_events(seed: int, n_users: int, max_ev: int):
    """Deterministic event stream: hashes of (seed, user, i) pick type
    and timestamp offsets, including deliberate ts ties (offset div 3)
    so tie-break paths execute."""
    rows = []
    eid = 0
    for u in range(n_users):
        n = (hash_((seed, u)) % max_ev) + 1
        for i in range(n):
            h = hash_((seed, u, i))
            ts = T0 + dt.timedelta(seconds=(h % 50) * 600 // 3)
            rows.append((eid, ts, u, TYPES[h % len(TYPES)],
                         float((h % 9000) / 100.0 + 0.25)))
            eid += 1
    return rows


def hash_(t) -> int:
    x = 0xcbf29ce484222325
    for v in t:
        x = (x ^ (v * 0x100000001b3 + 0x9E3779B97F4A7C15)) \
            * 0x100000001b3 % (1 << 63)
    return x


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def _ref_funnel_lags(rows, steps):
    """Greedy strictly-after funnel on the (ts, event_id, type)-sorted
    stream, recording each stage-transition lag."""
    by_user = {}
    for eid, ts, u, et, _v in rows:
        by_user.setdefault(u, []).append((ts, eid, et))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        stage, t, lags = 0, None, {}
        for ts, _eid, et in evs:
            if stage < len(steps) and et == steps[stage] and (
                    stage == 0 or ts > t):
                if stage >= 1:
                    lags[stage] = int((ts - t).total_seconds())
                stage, t = stage + 1, ts
        for k, lag in lags.items():
            n, s = out.get(k, (0, 0))
            out[k] = (n + 1, s + lag)
    return {k: (n, s, (s * 1000000) // n) for k, (n, s) in out.items()}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_funnel_stage_lags_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=40, max_ev=30)
    got = {
        r["stage_pair"]: (r["n_users"], r["sum_lag_s"], r["mean_lag_fp"])
        for r in ev.funnel_stage_lags(_df(spark, rows)).collect()
    }
    assert got == _ref_funnel_lags(rows, ev.FUNNEL_STEPS)


def _ref_median(rows):
    by_type = {}
    for _eid, _ts, _u, et, v in rows:
        by_type.setdefault(et, []).append(int(v * 100.0 + 0.5))
    out = {}
    for et, vs in by_type.items():
        vs.sort()
        n = len(vs)
        out[et] = (n, vs[(n + 1) // 2 - 1], vs[n // 2])
    return out


@pytest.mark.parametrize("seed", [4, 5])
def test_value_median_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=30, max_ev=25)
    got = {
        r["event_type"]: (r["n_events"], r["median_lo_cents"],
                          r["median_hi_cents"])
        for r in ev.value_median_by_type(_df(spark, rows)).collect()
    }
    assert got == _ref_median(rows)


def _ref_activity_deciles(rows):
    from collections import Counter
    per = Counter(u for _eid, _ts, u, _et, _v in rows)
    counts = sorted(per.values(), reverse=True)
    tot_u, tot_e = len(counts), sum(counts)
    out = {}
    for d in range(1, 11):
        cum_u = cum_e = 0
        for c in counts:
            cum_u += 1
            cum_e += c
            if cum_u * 10 >= d * tot_u:
                # extend through ties at the boundary activity level
                floor_c = c
                for c2 in counts[cum_u:]:
                    if c2 != floor_c:
                        break
                    cum_u += 1
                    cum_e += c2
                out[d] = (floor_c, cum_u, cum_e,
                          (cum_e * 1000000) // tot_e)
                break
    return out


@pytest.mark.parametrize("seed", [6, 7])
def test_activity_deciles_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=50, max_ev=40)
    got = {
        r["decile"]: (r["activity_floor"], r["n_users_cum"],
                      r["events_cum"], r["share_fp"])
        for r in ev.activity_deciles(_df(spark, rows)).collect()
    }
    assert got == _ref_activity_deciles(rows)


def _ref_rolling_wau(rows):
    from collections import defaultdict
    ud = {(u, ts.date()) for _eid, ts, u, _et, _v in rows}
    per_day = defaultdict(set)
    for u, d in ud:
        per_day[d].add(u)
    days = sorted(per_day)
    out = {}
    for d in days:
        users = set()
        for k in range(7):
            users |= per_day.get(d - dt.timedelta(days=k), set())
        b = len(users).bit_length() - 1
        n, s = out.get(b, (0, 0))
        out[b] = (n + 1, s + len(users))
    return out


@pytest.mark.parametrize("seed", [8, 9])
def test_rolling_wau_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=40, max_ev=30)
    got = {r["wau_band"]: (r["n_days"], r["sum_wau"]) for r in
           ev.rolling_wau(_df(spark, rows)).collect()}
    assert got == _ref_rolling_wau(rows)


def _ref_dense_hourly(rows):
    from collections import Counter
    hours = [ts.replace(minute=0, second=0, microsecond=0)
             for _eid, ts, _u, _et, _v in rows]
    lo, hi = min(hours), max(hours)
    n_hours = int((hi - lo).total_seconds() // 3600) + 1
    types = {et for _eid, _ts, _u, et, _v in rows}
    cnt = Counter((h, et) for h, (_eid, ts, _u, et, _v)
                  in zip(hours, rows))
    out = {}
    for et in types:
        live = sum(1 for (h, t), c in cnt.items() if t == et and c > 0)
        total = sum(c for (h, t), c in cnt.items() if t == et)
        out[et] = (n_hours, n_hours - live, total)
    return out


@pytest.mark.parametrize("seed", [10, 11])
def test_dense_hourly_counts_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=25, max_ev=20)
    got = {r["event_type"]: (r["n_hours"], r["dead_hours"], r["n_events"])
           for r in ev.dense_hourly_counts(_df(spark, rows)).collect()}
    assert got == _ref_dense_hourly(rows)


def _ref_entry_exit(rows, gap_s=1800):
    from collections import defaultdict
    by_user = defaultdict(list)
    for eid, ts, u, et, _v in rows:
        by_user[u].append((ts, eid, et))
    cens = defaultdict(lambda: [0, 0])
    for u, evs in by_user.items():
        evs.sort()
        sessions = []
        for ts, eid, et in evs:
            if not sessions or (ts - sessions[-1][-1][0]).total_seconds() \
                    > gap_s:
                sessions.append([])
            sessions[-1].append((ts, eid, et))
        for sess in sessions:
            k = (sess[0][2], sess[-1][2])
            cens[k][0] += 1
            cens[k][1] += len(sess)
    return {k: tuple(v) for k, v in cens.items()}


@pytest.mark.parametrize("seed", [12, 13])
def test_session_entry_exit_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=35, max_ev=25)
    got = {(r["entry_type"], r["exit_type"]): (r["n_sessions"],
                                               r["sum_events"])
           for r in ev.session_entry_exit(_df(spark, rows)).collect()}
    assert got == _ref_entry_exit(rows)


def _ref_session_durations(rows, gap_s=1800):
    from collections import defaultdict
    by_user = defaultdict(list)
    for eid, ts, u, et, _v in rows:
        by_user[u].append((ts, eid))
    cens = defaultdict(lambda: [0, 0])
    for _u, evs in by_user.items():
        evs.sort()
        sessions = []
        for ts, eid in evs:
            if not sessions or (ts - sessions[-1][-1]).total_seconds() \
                    > gap_s:
                sessions.append([])
            sessions[-1].append(ts)
        for sess in sessions:
            m = int((sess[-1] - sess[0]).total_seconds()) // 60
            cens[m][0] += 1
            cens[m][1] += len(sess)
    return {k: tuple(v) for k, v in cens.items()}


@pytest.mark.parametrize("seed", [14, 15])
def test_session_durations_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=35, max_ev=25)
    got = {r["duration_min"]: (r["n_sessions"], r["sum_events"]) for r in
           ev.session_durations(_df(spark, rows)).collect()}
    assert got == _ref_session_durations(rows)


def _ref_ltv(rows):
    from collections import defaultdict
    cents = defaultdict(int)
    for _eid, _ts, u, et, v in rows:
        if et == "purchase":
            cents[u] += int(v * 100.0 + 0.5)
    cens = defaultdict(lambda: [0, 0])
    for _u, c in cents.items():
        b = c.bit_length() - 1 if c > 0 else -1
        cens[b][0] += 1
        cens[b][1] += c
    return {k: tuple(v) for k, v in cens.items()}


@pytest.mark.parametrize("seed", [16, 17])
def test_user_ltv_bands_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=40, max_ev=30)
    got = {r["ltv_band"]: (r["n_users"], r["sum_cents"]) for r in
           ev.user_ltv_bands(_df(spark, rows)).collect()}
    assert got == _ref_ltv(rows)


def _ref_bot_bursts(rows, window_s=10, k=3):
    from collections import Counter, defaultdict
    by_user = defaultdict(list)
    for eid, ts, u, _et, _v in rows:
        by_user[u].append((ts, eid))
    out = Counter()
    for u, evs in by_user.items():
        evs.sort()
        n = sum(1 for i in range(len(evs))
                if i >= k - 1 and (evs[i][0] - evs[i - (k - 1)][0])
                .total_seconds() <= window_s)
        out[n] += 1
    return dict(out)


@pytest.mark.parametrize("seed", [18, 19])
def test_bot_bursts_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=30, max_ev=40)
    got = {r["n_bursts"]: r["n_users"] for r in
           ev.bot_bursts(_df(spark, rows)).collect()}
    assert got == _ref_bot_bursts(rows)


def _ref_conversion_lags(rows):
    from collections import defaultdict
    su, pu = {}, defaultdict(list)
    for _eid, ts, u, et, _v in rows:
        if et == "signup":
            su[u] = min(su.get(u, ts), ts)
        elif et == "purchase":
            pu[u].append(ts)
    cens = defaultdict(lambda: [0, 0])
    for u, t0 in su.items():
        after = [t for t in pu.get(u, []) if t > t0]
        if not after:
            continue
        lag = int((min(after) - t0).total_seconds())
        b = lag.bit_length() - 1 if lag > 0 else -1
        cens[b][0] += 1
        cens[b][1] += lag
    return {k: tuple(v) for k, v in cens.items()}


@pytest.mark.parametrize("seed", [20, 21])
def test_conversion_lag_bands_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=45, max_ev=30)
    got = {r["lag_band"]: (r["n_users"], r["sum_lag_s"]) for r in
           ev.conversion_lag_bands(_df(spark, rows)).collect()}
    assert got == _ref_conversion_lags(rows)


def _ref_weekly_stickiness(rows):
    from collections import defaultdict
    days = defaultdict(set)   # (week, day) -> users
    weeks = defaultdict(set)  # week -> users
    for _eid, ts, u, _et, _v in rows:
        d = ts.date()
        wk = d - dt.timedelta(days=d.weekday())
        days[(wk, d)].add(u)
        weeks[wk].add(u)
    out = {}
    for wk, users in weeks.items():
        wdays = [dd for (w, dd) in days if w == wk]
        sum_dau = sum(len(days[(wk, dd)]) for dd in wdays)
        n_days = len(wdays)
        wau = len(users)
        out[wk.strftime("%Y-%m-%d")] = (
            wau, n_days, sum_dau, sum_dau * 1000000 // (n_days * wau))
    return out


@pytest.mark.parametrize("seed", [22, 23])
def test_weekly_stickiness_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=40, max_ev=30)
    got = {r["week"]: (r["wau"], r["n_days"], r["sum_dau"],
                       r["stickiness_fp"]) for r in
           ev.weekly_stickiness(_df(spark, rows)).collect()}
    assert got == _ref_weekly_stickiness(rows)


def _ref_purchase_attribution(rows):
    from collections import defaultdict
    by_user = defaultdict(list)
    for eid, ts, u, et, v in rows:
        by_user[u].append((ts, eid, et, v))
    cens = defaultdict(lambda: [0, 0])
    for _u, evs in by_user.items():
        evs.sort()
        for i, (_ts, _eid, et, v) in enumerate(evs):
            if et != "purchase":
                continue
            prior = evs[i - 1][2] if i > 0 else "(none)"
            cens[prior][0] += 1
            cens[prior][1] += int(v * 100.0 + 0.5)
    return {k: tuple(x) for k, x in cens.items()}


@pytest.mark.parametrize("seed", [24, 25])
def test_purchase_attribution_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=35, max_ev=25)
    got = {r["prior_type"]: (r["n_purchases"], r["cents_sum"]) for r in
           ev.purchase_attribution(_df(spark, rows)).collect()}
    assert got == _ref_purchase_attribution(rows)


def _ref_hourly_errors(rows):
    from collections import defaultdict
    cens = defaultdict(lambda: [0, 0])
    for _eid, ts, _u, et, _v in rows:
        cens[ts.hour][0] += 1
        cens[ts.hour][1] += et == "error"
    return {h: (n, e, e * 1000000 // n) for h, (n, e) in cens.items()}


@pytest.mark.parametrize("seed", [26])
def test_hourly_error_profile_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=30, max_ev=30)
    got = {r["hour_of_day"]: (r["n_events"], r["n_errors"],
                              r["error_rate_fp"]) for r in
           ev.hourly_error_profile(_df(spark, rows)).collect()}
    assert got == _ref_hourly_errors(rows)


def _ref_survival(rows):
    """Pure-Python KM life table: per user first signup, first
    purchase at-or-after it, censor at the global last event DAY;
    n_at_risk via suffix sums over the day spine."""
    s_ts = {}
    for _eid, ts, u, et, _v in rows:
        if et == "signup" and (u not in s_ts or ts < s_ts[u]):
            s_ts[u] = ts
    fp = {}
    for _eid, ts, u, et, _v in rows:
        if (et == "purchase" and u in s_ts and ts >= s_ts[u]
                and (u not in fp or ts < fp[u])):
            fp[u] = ts
    end_day = max(ts.date() for _eid, ts, _u, _et, _v in rows)
    durs = []
    for u, st in s_ts.items():
        if u in fp:
            durs.append(((fp[u].date() - st.date()).days, 1))
        else:
            durs.append(((end_day - st.date()).days, 0))
    mx = max(d for d, _e in durs)
    out = {}
    for d in range(mx + 1):
        at_risk = sum(1 for dd, _e in durs if dd >= d)
        n_ev = sum(1 for dd, e in durs if dd == d and e)
        n_cen = sum(1 for dd, e in durs if dd == d and not e)
        out[d] = (at_risk, n_ev, n_cen)
    return out


@pytest.mark.parametrize("seed", [30, 31])
def test_survival_table_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=50, max_ev=25)
    got = {r["day"]: (r["n_at_risk"], r["n_events"], r["n_censored"])
           for r in ev.survival_table(_df(spark, rows)).collect()}
    ref = _ref_survival(rows)
    assert got == ref
    # censoring really occurs (the distinguishing semantics) and the
    # at-risk series is the exact suffix sum of arrivals
    assert any(c > 0 for _a, _e, c in ref.values())
    days = sorted(ref)
    for a, b in zip(days, days[1:]):
        assert ref[a][0] == ref[b][0] + ref[a][1] + ref[a][2]


def _ref_mad(rows):
    """Statistics-textbook reference: sort the raw cent values, take
    the lower median by index, sort absolute deviations, index again —
    no histogram formulation shared with the engine."""
    import math as _m
    by_type = {}
    for _eid, _ts, _u, et, v in rows:
        by_type.setdefault(et, []).append(int(_m.floor(v * 100.0 + 0.5)))
    out = {}
    for et, vs in by_type.items():
        vs.sort()
        n = len(vs)
        med = vs[(n + 1) // 2 - 1]
        dev = sorted(abs(x - med) for x in vs)
        out[et] = (n, med, dev[(n + 1) // 2 - 1], dev[n // 2])
    return out


@pytest.mark.parametrize("seed", [40, 41])
def test_value_mad_by_type_matches_reference(spark, seed):
    rows = _mk_events(seed, n_users=40, max_ev=25)
    got = {r["event_type"]: (r["n_events"], r["median_cents"],
                             r["mad_lo_cents"], r["mad_hi_cents"])
           for r in ev.value_mad_by_type(_df(spark, rows)).collect()}
    assert got == _ref_mad(rows)
