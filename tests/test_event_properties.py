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
