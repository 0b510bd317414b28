"""Cohort-retention correctness: oracle parity plus the triangle
identities (offset-0 row is the cohort itself at 100%; retained
users never exceed cohort size; triangle is span-bounded)."""

import pytest

from bike_analyzer_spark.operators import useranalytics
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_cohort_retention_vs_oracle(spark, duck):
    df = useranalytics.cohort_retention(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, useranalytics.ORACLES["cohort_retention"],
        name="cohort_retention",
    )


def test_triangle_identities(spark):
    rows = useranalytics.cohort_retention(spark, SF_DIR_ORACLE).collect()
    assert rows
    cohorts: dict = {}
    for r in rows:
        cohorts.setdefault(r["cohort_week"], []).append(r)
    for series in cohorts.values():
        base = next(r for r in series if r["week_offset"] == 0)
        assert base["n_users"] == base["cohort_size"]
        assert base["retention_pct"] == 100.0
        for r in series:
            assert 0 < r["n_users"] <= r["cohort_size"]
            assert r["cohort_size"] == base["cohort_size"]
    # retention must actually decay somewhere, or the fixture is
    # degenerate and the percentage math is untested
    assert any(
        r["week_offset"] > 0 and r["n_users"] < r["cohort_size"]
        for r in rows
    )


def test_attribution_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators.useranalytics import (
        ORACLES,
        attribution_last_touch,
    )

    assert_matches_oracle(
        attribution_last_touch(spark, SF_DIR_ORACLE),
        duck,
        ORACLES["attribution_last_touch"],
        name="attribution_last_touch",
    )


def test_attribution_matches_pure_python(spark):
    """Scan each user's sorted sequence in plain Python: credit each
    purchase to the latest view/click within the window."""
    from collections import defaultdict

    from bike_analyzer_spark.operators import useranalytics as ua

    rows = (
        spark.read.parquet(f"{SF_DIR_ORACLE}/events.parquet")
        .selectExpr(
            "user_id",
            "event_type",
            "event_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
            "CAST(round(value * 100) AS BIGINT) AS v",
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.us, r.event_id, r.event_type, r.v))
    win = ua.ATTR_WINDOW_HOURS * 3_600_000_000
    per = defaultdict(lambda: [0, 0])
    for seq in by_user.values():
        seq.sort()
        touch = None  # (us, type)
        for us, _, et, v in seq:
            if et == "purchase":
                ch = (
                    touch[1]
                    if touch and touch[0] >= us - win
                    else "(none)"
                )
                per[ch][0] += 1
                per[ch][1] += v
            if et in ua.ATTR_CHANNELS:
                touch = (us, et)
    got = {
        r.channel: (r.n_purchases, round(r.revenue * 100))
        for r in ua.attribution_last_touch(spark, SF_DIR_ORACLE).collect()
    }
    assert got == {c: (n, cts) for c, (n, cts) in per.items()}


def test_ltv_decay_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators.useranalytics import (
        ORACLES,
        ltv_decay,
    )

    assert_matches_oracle(
        ltv_decay(spark, SF_DIR_ORACLE),
        duck,
        ORACLES["ltv_decay"],
        name="ltv_decay",
    )


def test_ltv_decay_matches_pure_python(spark):
    """Quantized-integer decay sums equal the float e^(-dt/tau)
    formula to inside the ppm quantization, and the decayed value
    never exceeds the raw value."""
    import math
    from collections import defaultdict

    from bike_analyzer_spark.operators import useranalytics as ua

    rows = (
        spark.read.parquet(f"{SF_DIR_ORACLE}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(round(value * 100) AS BIGINT) AS v",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        )
        .collect()
    )
    ref = max(r.us for r in rows)
    tau = ua.LTV_TAU_DAYS * 86_400_000_000
    per = defaultdict(float)
    raw = defaultdict(int)
    for r in rows:
        per[r.user_id] += r.v * math.exp(-(ref - r.us) / tau)
        raw[r.user_id] += r.v
    got = ua.ltv_decay(spark, SF_DIR_ORACLE).collect()
    assert len(got) == ua.LTV_TOP
    for r in got:
        want = per[r.user_id] / 100
        # per-event ppm quantization: error <= n_events * 0.5e-6 * v
        assert abs(r.decayed_value - want) < 1e-3
        assert r.decayed_value <= r.raw_value + 1e-9
        assert raw[r.user_id] == round(r.raw_value * 100)


def test_attribution_delay_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators.useranalytics import (
        ORACLES,
        attribution_delay,
    )

    assert_matches_oracle(
        attribution_delay(spark, SF_DIR_ORACLE),
        duck,
        ORACLES["attribution_delay"],
        name="attribution_delay",
    )


def test_attribution_delay_consistent_with_last_touch(spark):
    """The delay report's conversion counts equal the revenue
    report's attributed purchase counts per channel, and delays
    respect the window bound."""
    from bike_analyzer_spark.operators import useranalytics as ua

    rev = {
        r.channel: r.n_purchases
        for r in ua.attribution_last_touch(spark, SF_DIR_ORACLE).collect()
        if r.channel != "(none)"
    }
    dly = {
        r.channel: r
        for r in ua.attribution_delay(spark, SF_DIR_ORACLE).collect()
    }
    assert {c: d.n_conversions for c, d in dly.items()} == rev
    bound = ua.ATTR_WINDOW_HOURS * 3600
    for d in dly.values():
        assert 0 <= d.min_delay_s <= d.mean_delay_s <= d.max_delay_s
        assert d.max_delay_s <= bound


def test_dau_wau_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators import useranalytics as ua

    assert_matches_oracle(
        ua.dau_wau_stickiness(spark, SF_DIR_ORACLE),
        duck,
        ua.ORACLES["dau_wau_stickiness"],
        name="dau_wau_stickiness",
    )


def test_dau_wau_identities(spark):
    """WAU bounds DAU; the spine is gap-free; WAU equals a brute
    recount of distinct users over each trailing 7-day window."""
    import duckdb as dk

    from bike_analyzer_spark.operators import useranalytics as ua

    rows = ua.dau_wau_stickiness(spark, SF_DIR_ORACLE).collect()
    days = [r.day for r in rows]
    assert days == sorted(days)
    assert (days[-1] - days[0]).days + 1 == len(days)
    brute = {
        d: n
        for d, n in dk.sql(
            f"""
            WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d
                        FROM '{SF_DIR_ORACLE}/events.parquet'),
            cal AS (SELECT DISTINCT d FROM ud)
            SELECT cal.d, count(DISTINCT ud.user_id)
            FROM cal JOIN ud
              ON ud.d BETWEEN cal.d - INTERVAL 6 DAY AND cal.d
            GROUP BY cal.d
            """
        ).fetchall()
    }
    for r in rows:
        assert r.dau <= r.wau
        assert r.wau == brute.get(r.day, r.wau)
        if r.wau:
            assert abs(r.stickiness_pct - 100 * r.dau / r.wau) <= 5e-3


def test_ordered_funnel_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators import useranalytics as ua

    assert_matches_oracle(
        ua.ordered_funnel(spark, SF_DIR_ORACLE),
        duck,
        ua.ORACLES["ordered_funnel"],
        name="ordered_funnel",
    )


def test_ordered_funnel_monotone_and_sequenced(spark):
    """Counts are monotone non-increasing; a python replay of the
    min-chained same-day rule over the raw events agrees exactly."""
    from collections import defaultdict

    import duckdb as dk

    from bike_analyzer_spark.operators import useranalytics as ua

    rows = ua.ordered_funnel(spark, SF_DIR_ORACLE).collect()
    ns = [r.n_user_days for r in sorted(rows, key=lambda r: r.step_idx)]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert ns[0] > ns[1] > 0, "fixture funnel must show real dropout"
    ev = defaultdict(list)
    for uid, d, et, us in dk.sql(
        f"""SELECT user_id, CAST(ts AS DATE), event_type,
               epoch_us(CAST(ts AS TIMESTAMP))
        FROM '{SF_DIR_ORACLE}/events.parquet'"""
    ).fetchall():
        ev[(uid, d)].append((us, et))
    want = [0] * len(ua.FUNNEL_STEPS)
    for evs in ev.values():
        anchor, depth = -1, 0
        for step in ua.FUNNEL_STEPS:
            nxt = [
                us
                for us, et in evs
                if et == step and (depth == 0 or us > anchor)
            ]
            if not nxt:
                break
            anchor = min(nxt)
            want[depth] += 1
            depth += 1
    assert ns == want


def test_attribution_position_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators import useranalytics as ua

    assert_matches_oracle(
        ua.attribution_position(spark, SF_DIR_ORACLE),
        duck,
        ua.ORACLES["attribution_position"],
        name="attribution_position",
    )


def test_attribution_position_conserves_credit(spark):
    """Every purchase's credit sums to exactly 10000 bp, channel
    totals partition the purchase set, and credited revenue adds up
    to total purchase revenue to the cent."""
    import duckdb as dk

    from bike_analyzer_spark.operators import useranalytics as ua

    rows = ua.attribution_position(spark, SF_DIR_ORACLE).collect()
    n_purch, tot_rev_c = dk.sql(
        f"""SELECT count(*),
               sum(CAST(round(value * 100) AS BIGINT))
        FROM '{SF_DIR_ORACLE}/events.parquet'
        WHERE event_type = 'purchase'"""
    ).fetchone()
    # bp conservation: the grand total is exactly 10000 per purchase
    assert sum(r.sum_bp for r in rows) == 10000 * n_purch
    # revenue conservation to the cent (credited_revenue is the
    # half-up display of vbp/1e6; sum the exact bp-weighted cents)
    assert (
        sum(round(r.credited_revenue * 100) for r in rows)
        == pytest.approx(tot_rev_c, abs=len(rows))
    )
    shares = sum(r.revenue_share_pct for r in rows)
    assert abs(shares - 100.0) < 0.01
    assert {r.channel for r in rows} <= set(ua.ATTR_CHANNELS) | {
        "(none)"
    }


def test_cohort_ltv_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators import useranalytics as ua

    assert_matches_oracle(
        ua.cohort_ltv(spark, SF_DIR_ORACLE),
        duck,
        ua.ORACLES["cohort_ltv"],
        name="cohort_ltv",
    )


def test_cohort_ltv_consistent_with_retention(spark):
    """Cohort sizes agree with cohort_retention; cumulative revenue
    is non-decreasing and ends at the cohort's total purchase
    revenue; LTV tracks cum/size."""
    from bike_analyzer_spark.operators import useranalytics as ua

    ltv = ua.cohort_ltv(spark, SF_DIR_ORACLE).collect()
    ret = ua.cohort_retention(spark, SF_DIR_ORACLE).collect()
    sizes = {r.cohort_week: r.cohort_size for r in ret}
    by_cohort: dict = {}
    for r in ltv:
        assert sizes[r.cohort_week] == r.cohort_size
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for series in by_cohort.values():
        series.sort(key=lambda r: r.week_offset)
        cums = [r.cum_revenue for r in series]
        assert cums == sorted(cums)
        assert cums[-1] == pytest.approx(
            sum(r.revenue for r in series), abs=1e-6
        )
        for r in series:
            assert r.ltv_per_user == pytest.approx(
                round(r.cum_revenue / r.cohort_size, 4), abs=5e-4
            )


def test_web_order_bridge_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators import useranalytics as ua

    assert_matches_oracle(
        ua.web_order_bridge(spark, SF_DIR_ORACLE),
        duck,
        ua.ORACLES["web_order_bridge"],
        name="web_order_bridge",
    )


def test_web_order_bridge_identities(spark):
    import duckdb as dk

    from bike_analyzer_spark.operators import useranalytics as ua

    rows = ua.web_order_bridge(spark, SF_DIR_ORACLE).collect()
    n_cust, n_web = dk.sql(
        f"""SELECT (SELECT count(*)
                FROM '{SF_DIR_ORACLE}/customer.parquet'),
               (SELECT count(DISTINCT user_id)
                FROM '{SF_DIR_ORACLE}/events.parquet')"""
    ).fetchone()
    assert sum(r.n_customers for r in rows) == n_cust
    assert sum(r.n_web for r in rows) == n_web
    for r in rows:
        assert 0 <= r.n_web_buyers <= min(r.n_web, r.n_buyers)
        assert r.n_buyers <= r.n_customers
    # the web cohort is a strict subset somewhere, or the bridge
    # distinguishes nothing
    assert any(r.n_web < r.n_customers for r in rows)


def test_retention_survival_vs_oracle(spark, duck):
    assert_matches_oracle(
        useranalytics.retention_survival(spark, SF_DIR_ORACLE),
        duck,
        useranalytics.ORACLES["retention_survival"],
        name="retention_survival",
    )


def test_retention_survival_python_replay(spark):
    """Replay the whole Kaplan-Meier estimator — per-user exit
    marking, risk suffix sums, and the integer-ppm product
    recurrence — in plain Python from the raw events."""
    from collections import defaultdict
    from datetime import date

    rows = (
        spark.read.parquet(f"{SF_DIR_ORACLE}/events.parquet")
        .selectExpr(
            "user_id", "CAST(ts AS DATE) AS day", "event_type"
        )
        .collect()
    )
    first: dict[int, date] = {}
    fpurchase: dict[int, date] = {}
    for r in rows:
        if r.user_id not in first or r.day < first[r.user_id]:
            first[r.user_id] = r.day
        if r.event_type == "purchase" and (
            r.user_id not in fpurchase or r.day < fpurchase[r.user_id]
        ):
            fpurchase[r.user_id] = r.day
    max_day = max(
        max(first.values()), max(fpurchase.values(), default=date.min)
    )
    W = useranalytics.SURVIVAL_WINDOW_DAYS
    exits: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for u, f in first.items():
        pd = (fpurchase[u] - f).days if u in fpurchase else None
        ow = min(W, (max_day - f).days)
        if pd is not None and pd <= ow:
            exits[pd][0] += 1
        else:
            exits[ow][1] += 1
    got = useranalytics.retention_survival(spark, SF_DIR_ORACLE).collect()
    assert [r.t_days for r in got] == sorted(exits)
    s = useranalytics.SURVIVAL_PPM
    n_after = 0
    for r in reversed(got):
        n_after += exits[r.t_days][0] + exits[r.t_days][1]
        assert r.n_risk == n_after
    prev = s
    for r in got:
        d, c = exits[r.t_days]
        assert (r.n_converted, r.n_censored) == (d, c)
        if d > 0:
            prev = (2 * prev * (r.n_risk - d) + r.n_risk) // (
                2 * r.n_risk
            )
        assert r.survival_ppm == prev
        assert r.survival == prev / s
    # both exit kinds must occur or the censoring branch is untested
    assert sum(v[0] for v in exits.values()) > 0
    assert sum(v[1] for v in exits.values()) > 0
    # survival is non-increasing, within (0, 1]
    vals = [r.survival_ppm for r in got]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert 0 < vals[-1] <= s
