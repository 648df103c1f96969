"""Event-time operators: sessionization, as-of join, tumbling rollup
(batch), and the applyInPandasWithState streaming sessionizer."""

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events as ev

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def edf(spark):
    rows = [
        # user 1: two sessions split by a 60-min gap (gap = 30 min)
        (0, _ts(0), 1, "click", 1.0),
        (1, _ts(10), 1, "click", 2.0),
        (2, _ts(20), 1, "purchase", 3.0),
        (3, _ts(90), 1, "click", 4.0),
        (4, _ts(95), 1, "click", 5.0),
        # user 2: one session
        (5, _ts(5), 2, "signup", 6.0),
        (6, _ts(25), 2, "purchase", 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


class TestSessionize:
    def test_sessions_split_on_gap(self, spark, edf):
        got = {
            r["event_id"]: r["session_id"]
            for r in ev.sessionize(edf, gap_seconds=1800).collect()
        }
        assert got[0] == got[1] == got[2] == "1-0"
        assert got[3] == got[4] == "1-1"
        assert got[5] == got[6] == "2-0"

    def test_session_stats(self, spark, edf):
        got = {
            (r["user_id"], r["session_id"]): (r["n_events"], r["duration_sec"])
            for r in ev.session_stats(edf, gap_seconds=1800).collect()
        }
        assert got[(1, "1-0")] == (3, 1200.0)
        assert got[(1, "1-1")] == (2, 300.0)
        assert got[(2, "2-0")] == (2, 1200.0)


class TestAsofJoin:
    def test_backward_latest_match(self, spark, edf):
        left = edf.where(F.col("event_type") == "purchase")
        right = edf.where(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").alias("click_value")
        )
        out = ev.asof_join(
            left, right, key_col="user_id", right_value_cols=["click_value"]
        ).collect()
        by_id = {r["event_id"]: r for r in out}
        # purchase at t=20 (user 1): latest click at t=10 (value 2.0)
        assert by_id[2]["right_click_value"] == 2.0
        assert by_id[2]["right_ts"] == _ts(10)
        # purchase at t=25 (user 2): no click rows for user 2 -> nulls
        assert by_id[6]["right_ts"] is None and by_id[6]["right_click_value"] is None
        # all left columns preserved
        assert by_id[2]["value"] == 3.0 and by_id[2]["event_type"] == "purchase"

    def test_equal_ts_is_inclusive(self, spark):
        left = spark.createDataFrame([(1, T0, 10)], "id long, ts timestamp, user_id long")
        right = spark.createDataFrame(
            [(T0, 10, 99.0)], "ts timestamp, user_id long, v double"
        )
        out = ev.asof_join(left, right, key_col="user_id", right_value_cols=["v"]).collect()
        assert out[0]["right_v"] == 99.0

    def test_tolerance(self, spark, edf):
        left = edf.where(F.col("event_type") == "purchase")
        right = edf.where(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").alias("cv")
        )
        out = ev.asof_join(
            left, right, key_col="user_id", right_value_cols=["cv"],
            tolerance_seconds=60,
        ).collect()
        by_id = {r["event_id"]: r for r in out}
        assert by_id[2]["right_cv"] is None  # 10 min gap > 60 s tolerance


class TestTumbling:
    def test_hourly_buckets(self, spark, edf):
        got = {
            (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
            for r in ev.tumbling_rollup(edf, 3600, group_cols=["event_type"]).collect()
        }
        assert got[(T0, "click")] == (2, 3.0)       # t=0,10
        assert got[(_ts(60), "click")] == (2, 9.0)  # t=90,95
        assert got[(T0, "purchase")] == (2, 10.0)   # t=20,25


class TestStreamingSessions:
    def test_stateful_sessionizer(self, spark, tmp_path):
        """applyInPandasWithState end-to-end: stream the fixture events
        in, expect closed sessions (gap) plus timeout-flushed tails."""
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming import (
            sessions as ss,
        )

        src = os.path.join(str(tmp_path), "events_in")
        rows = [
            (0, _ts(0), 1), (1, _ts(10), 1), (2, _ts(90), 1),
            (3, _ts(5), 2),
        ]
        spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long").write.parquet(src)
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .parquet(src)
        )
        out = ss.stream_sessions(stream, gap_seconds=1800, timeout_ms=2000)
        q = (
            out.writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            import time

            deadline = time.time() + 90
            want = {(1, 2), (1, 1), (2, 1)}  # (user, n_events) incl. timeout flushes
            got = set()
            while time.time() < deadline and got != want:
                time.sleep(2)
                got = {
                    (r["user_id"], r["n_events"])
                    for r in spark.sql("SELECT * FROM sessions_out").collect()
                }
            assert got == want, got
        finally:
            q.stop()

    def test_session_fn_unit(self):
        """Drive make_session_fn directly with a fake GroupState."""
        import pandas as pd

        class FakeState:
            def __init__(self):
                self._v = None
                self.hasTimedOut = False
                self.timeout = None

            @property
            def exists(self):
                return self._v is not None

            @property
            def get(self):
                if self._v is None:
                    raise ValueError("no state")
                return self._v

            def update(self, v):
                self._v = tuple(v)

            def remove(self):
                self._v = None

            def setTimeoutDuration(self, ms):
                self.timeout = ms

        fn = ss_fn = None
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming.sessions import (
            make_session_fn,
        )

        fn = make_session_fn(gap_seconds=1800, timeout_ms=1000)
        st = FakeState()
        pdf = pd.DataFrame({"ts": [T0, _ts(10), _ts(90)]})
        out = list(fn((1,), iter([pdf]), st))
        assert len(out) == 1 and out[0]["n_events"].tolist() == [2]
        assert st.exists and st.get[2] == 1  # open session: the t=90 event
        # timeout path flushes the open session
        st.hasTimedOut = True
        out2 = list(fn((1,), iter([]), st))
        assert out2[0]["n_events"].tolist() == [1]
        assert not st.exists


class TestRangeJoin:
    def _data(self, spark):
        from datetime import datetime

        pts = spark.createDataFrame(
            [(i, datetime(2024, 1, 1, 0, 0, i), i % 2) for i in range(50)],
            "pid long, ts timestamp, k long",
        )
        ivs = spark.createDataFrame(
            [
                (100, datetime(2024, 1, 1, 0, 0, 5), datetime(2024, 1, 1, 0, 0, 20), 0),
                (101, datetime(2024, 1, 1, 0, 0, 15), datetime(2024, 1, 1, 0, 0, 40), 1),
                (102, datetime(2024, 1, 1, 0, 0, 45), datetime(2024, 1, 1, 0, 0, 49), 0),
            ],
            "iid long, start_ts timestamp, end_ts timestamp, k long",
        )
        return pts, ivs

    def test_inner_equals_naive_between(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events as ev

        pts, ivs = self._data(spark)
        got = ev.range_join(pts, ivs.drop("k"), bucket_seconds=7)
        naive = pts.join(
            ivs.drop("k"),
            (pts.ts >= ivs.start_ts) & (pts.ts <= ivs.end_ts),
        )
        assert sorted((r["pid"], r["iid"]) for r in got.collect()) == sorted(
            (r["pid"], r["iid"]) for r in naive.collect()
        )

    def test_keyed_inner(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events as ev

        pts, ivs = self._data(spark)
        got = ev.range_join(pts, ivs, key_col="k", bucket_seconds=7)
        naive = pts.alias("p").join(
            ivs.alias("i"),
            (F.col("p.k") == F.col("i.k"))
            & (F.col("p.ts") >= F.col("i.start_ts"))
            & (F.col("p.ts") <= F.col("i.end_ts")),
        )
        assert sorted((r["pid"], r["iid"]) for r in got.collect()) == sorted(
            (r["pid"], r["iid"]) for r in naive.collect()
        )

    def test_left_keeps_unmatched_points(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events as ev

        pts, ivs = self._data(spark)
        got = ev.range_join(pts, ivs.drop("k"), bucket_seconds=7, how="left")
        matched_pids = {
            r["pid"] for r in ev.range_join(pts, ivs.drop("k"), bucket_seconds=7).collect()
        }
        rows = got.collect()
        assert {r["pid"] for r in rows} == set(range(50))  # every point kept
        for r in rows:
            if r["pid"] not in matched_pids:
                assert r["iid"] is None

    def test_left_matched_null_column_emitted_once(self, spark):
        # regression: the left-path anti-join used plain equality on
        # all point columns; a MATCHED point row with a NULL attribute
        # never equaled itself and was emitted twice (matched + with
        # null interval columns).  eqNullSafe per column fixes it.
        from collections import Counter
        from datetime import datetime

        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events as ev

        pts = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 0, 0, 10), None),   # matched, null attr
                (2, datetime(2024, 1, 1, 0, 0, 30), 7),      # matched, non-null
                (3, datetime(2024, 1, 1, 0, 0, 55), None),   # unmatched, null attr
            ],
            "pid long, ts timestamp, attr int",
        )
        ivs = spark.createDataFrame(
            [(100, datetime(2024, 1, 1, 0, 0, 5), datetime(2024, 1, 1, 0, 0, 40))],
            "iid long, start_ts timestamp, end_ts timestamp",
        )
        rows = ev.range_join(pts, ivs, bucket_seconds=7, how="left").collect()
        assert Counter(r["pid"] for r in rows) == {1: 1, 2: 1, 3: 1}
        by_pid = {r["pid"]: r for r in rows}
        assert by_pid[1]["iid"] == 100 and by_pid[2]["iid"] == 100
        assert by_pid[3]["iid"] is None

    def test_no_nested_loop_in_plan(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events as ev

        pts, ivs = self._data(spark)
        plan = ev.range_join(pts, ivs.drop("k"), bucket_seconds=7)._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestWindowFunnel:
    def _run(self, spark, rows, stages=("view", "click", "purchase"), window="INTERVAL 1 HOUR"):
        df = spark.createDataFrame(
            rows, "ts timestamp, user_id long, event_type string"
        )
        return {
            r["level"]: r["n_users"]
            for r in ev.window_funnel(df, list(stages), window).collect()
        }

    def test_full_and_partial_funnels(self, spark):
        rows = [
            # u1 completes all 3 in order within the hour
            (_ts(0), 1, "view"), (_ts(5), 1, "click"), (_ts(10), 1, "purchase"),
            # u2 reaches click only
            (_ts(0), 2, "view"), (_ts(7), 2, "click"),
            # u3 has view only
            (_ts(0), 3, "view"),
            # u4 never enters the funnel (purchase without view)
            (_ts(0), 4, "purchase"),
        ]
        assert self._run(spark, rows) == {1: 1, 2: 1, 3: 1}

    def test_window_anchored_at_stage_one(self, spark):
        # click at +50, purchase at +70: purchase is past the 1 h
        # anchor window even though it's within 1 h of the click
        rows = [(_ts(0), 1, "view"), (_ts(50), 1, "click"), (_ts(70), 1, "purchase")]
        assert self._run(spark, rows) == {2: 1}
        # a later anchor rescues it: second view at +30 restarts the clock
        rows.append((_ts(30), 1, "view"))
        assert self._run(spark, rows) == {3: 1}

    def test_order_required(self, spark):
        # purchase BEFORE click: funnel stops at click
        rows = [(_ts(0), 1, "view"), (_ts(10), 1, "purchase"), (_ts(20), 1, "click")]
        assert self._run(spark, rows) == {2: 1}

    def test_greedy_earliest_match(self, spark):
        # two clicks; the earlier one leaves room for the purchase
        rows = [
            (_ts(0), 1, "view"), (_ts(5), 1, "click"), (_ts(59), 1, "click"),
            (_ts(30), 1, "purchase"),
        ]
        assert self._run(spark, rows) == {3: 1}


class TestCohortRetention:
    def test_triangle(self, spark):
        rows = [
            # u1: first week 0, returns weeks 1 and 3
            (_ts(0), 1), (_ts(7 * 24 * 60), 1), (_ts(21 * 24 * 60), 1),
            # u2: first week 0 only
            (_ts(60), 2),
            # u3: first week 1, returns week 2
            (_ts(8 * 24 * 60), 3), (_ts(14 * 24 * 60), 3),
        ]
        df = spark.createDataFrame(rows, "ts timestamp, user_id long")
        got = {
            (r["cohort"], r["week_offset"]): r["n_users"]
            for r in ev.cohort_retention(df, origin="2024-01-01").collect()
        }
        assert got == {
            (0, 0): 2, (0, 1): 1, (0, 3): 1,
            (1, 0): 1, (1, 1): 1,
        }

    def test_same_period_dedup(self, spark):
        # many events inside one week count the user once
        rows = [(_ts(i), 1) for i in range(0, 300, 60)]
        df = spark.createDataFrame(rows, "ts timestamp, user_id long")
        got = ev.cohort_retention(df, origin="2024-01-01").collect()
        assert [(r["cohort"], r["week_offset"], r["n_users"]) for r in got] == [(0, 0, 1)]


class TestMarkovTransitions:
    def test_counts_probs_and_tiebreak(self, spark):
        rows = [
            # user 1: view -> click -> purchase
            ("e1", _ts(0), 1, "view"),
            ("e2", _ts(60), 1, "click"),
            ("e3", _ts(120), 1, "purchase"),
            # user 2: view -> click, view again
            ("e4", _ts(0), 2, "view"),
            ("e5", _ts(60), 2, "click"),
            ("e6", _ts(120), 2, "view"),
            # user 3: timestamp TIE at t=0 — event_id breaks it:
            # e7 (click) before e8 (view) -> transition click->view
            ("e7", _ts(0), 3, "click"),
            ("e8", _ts(0), 3, "view"),
        ]
        df = spark.createDataFrame(
            rows, "event_id string, ts timestamp, user_id long, event_type string"
        )
        got = {
            (r["src"], r["dst"]): (r["n"], r["p"])
            for r in ev.markov_transitions(df).collect()
        }
        # src=view: 2 transitions, all to click; src=click: 3 total,
        # 1 to purchase + 2 to view (user 3's tie resolved by event_id)
        assert got == {
            ("view", "click"): (2, 1.0),
            ("click", "purchase"): (1, 0.333333),
            ("click", "view"): (2, 0.666667),
        }

    def test_single_event_users_emit_nothing(self, spark):
        rows = [("e1", _ts(0), 1, "view"), ("e2", _ts(0), 2, "click")]
        df = spark.createDataFrame(
            rows, "event_id string, ts timestamp, user_id long, event_type string"
        )
        assert ev.markov_transitions(df).count() == 0


class TestZscoreOutliers:
    def test_hand_computed_outlier(self, spark):
        import statistics

        # group 'a': nine 10.0s and one 100.0 — the 100 is the outlier
        vals = [10.0] * 9 + [100.0]
        rows = [(f"e{i}", "a", v) for i, v in enumerate(vals)]
        # group 'b': constant (zero variance) -> no outliers
        rows += [(f"b{i}", "b", 5.0) for i in range(5)]
        # group 'c': single event (stddev undefined) -> no outliers
        rows += [("c0", "c", 99.0)]
        df = spark.createDataFrame(rows, "event_id string, event_type string, value double")
        got = {
            r["event_id"]: (r["event_type"], r["value"], r["z"])
            for r in ev.zscore_outliers(df, threshold=2.5).collect()
        }
        m, sd = statistics.mean(vals), statistics.stdev(vals)
        assert got == {"e9": ("a", 100.0, round((100.0 - m) / sd, 6))}

    def test_threshold_is_exclusive_and_symmetric(self, spark):
        # symmetric pair: both tails must flag
        vals = [0.0] * 20 + [50.0, -50.0]
        rows = [(f"e{i}", "a", v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "event_id string, event_type string, value double")
        got = ev.zscore_outliers(df, threshold=2.5).collect()
        assert {r["event_id"] for r in got} == {"e20", "e21"}
        zs = {r["event_id"]: r["z"] for r in got}
        assert zs["e20"] == -zs["e21"]


class TestDecayedCounts:
    def test_matches_python_replay(self, spark):
        import datetime as dt
        import math

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, "click", 2.0),
            (2, base + dt.timedelta(seconds=30, microseconds=250_000), "click", 4.0),
            (3, base + dt.timedelta(seconds=90), "buy", 10.0),
            (4, base + dt.timedelta(seconds=100), "click", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        got = {
            r["event_type"]: (r["n_events"], r["decayed_count"], r["decayed_value"])
            for r in ev.decayed_counts(df, tau_seconds=60.0).collect()
        }
        t = max(r[1] for r in rows)
        want = {}
        for _, ts, typ, v in rows:
            w = math.exp(-((t - ts).total_seconds()) / 60.0)
            n, c, s = want.get(typ, (0, 0.0, 0.0))
            want[typ] = (n + 1, c + w, s + w * v)
        for typ, (n, c, s) in want.items():
            assert got[typ][0] == n
            assert abs(got[typ][1] - round(c, 6)) < 1e-9
            assert abs(got[typ][2] - round(s, 6)) < 1e-9
        # the horizon event has weight exactly 1
        assert got["click"][1] < 3.0 and got["click"][1] > 1.0

    def test_larger_tau_keeps_more_mass(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (i, base + dt.timedelta(seconds=i * 600), "e", 1.0) for i in range(20)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        small = ev.decayed_counts(df, tau_seconds=60.0).collect()[0]
        big = ev.decayed_counts(df, tau_seconds=86400.0).collect()[0]
        assert big["decayed_count"] > small["decayed_count"]
        assert small["decayed_count"] >= 1.0  # horizon event always counts 1

    def test_empty(self, spark):
        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, event_type string, value double"
        )
        assert ev.decayed_counts(df).count() == 0


class TestConversionAttribution:
    def test_first_and_last_touch(self, spark):
        base = datetime(2024, 1, 1)
        rows = [
            # user 1: ad -> email -> purchase  (first=ad, last=email)
            (1, base, 1, "ad", 1.0),
            (2, base + timedelta(minutes=1), 1, "email", 1.0),
            (3, base + timedelta(minutes=2), 1, "purchase", 9.0),
            # user 1 buys again after one more touch: first STILL ad
            (4, base + timedelta(minutes=3), 1, "search", 1.0),
            (5, base + timedelta(minutes=4), 1, "purchase", 5.0),
            # user 2: organic purchase, no touches
            (6, base, 2, "purchase", 3.0),
            # user 3: purchase then a touch AFTER it (must not count)
            (7, base, 3, "purchase", 2.0),
            (8, base + timedelta(minutes=1), 3, "ad", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        got = {
            (r["first_touch"], r["last_touch"]): r["conversions"]
            for r in ev.conversion_attribution(df).collect()
        }
        assert got == {
            ("ad", "email"): 1,
            ("ad", "search"): 1,
            ("none", "none"): 2,
        }

    def test_prior_conversions_are_not_touches(self, spark):
        base = datetime(2024, 1, 1)
        rows = [
            (1, base, 1, "purchase", 1.0),
            (2, base + timedelta(minutes=1), 1, "purchase", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        got = {
            (r["first_touch"], r["last_touch"]): r["conversions"]
            for r in ev.conversion_attribution(df).collect()
        }
        assert got == {("none", "none"): 2}


class TestMadOutliers:
    def test_hand_computed_modified_zscore(self, spark):
        # group 'a': nine 10.0s and one 100.0 — median 10, MAD 0 would
        # kill the group, so spread the base: values 1..9 and 100.
        vals = [float(v) for v in range(1, 10)] + [100.0]
        rows = [(f"e{i}", "a", v) for i, v in enumerate(vals)]
        # group 'b': >= half identical -> MAD 0 -> no outliers even
        # though 1e9 is wildly off (the documented gate)
        rows += [(f"b{i}", "b", 5.0) for i in range(5)] + [("b9", "b", 1e9)]
        df = spark.createDataFrame(
            rows, "event_id string, event_type string, value double"
        )
        got = {
            r["event_id"]: (r["event_type"], r["value"], r["z"])
            for r in ev.mad_outliers(df, threshold=3.5).collect()
        }
        med = 5.5  # median of 1..9,100
        mad = 2.5  # |v-5.5| = 4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,94.5 -> median 2.5
        z = round(0.6745 * (100.0 - med) / mad, 6)
        assert got == {"e9": ("a", 100.0, z)}
        assert abs(z) > 3.5

    def test_robust_where_zscore_is_blinded(self, spark):
        # one colossal spike inflates sigma so the second, smaller
        # outlier hides from the z-score sweep but not from MAD
        vals = [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0,
                60.0, 1e6]
        rows = [(f"e{i}", "a", v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "event_id string, event_type string, value double"
        )
        mad_ids = {r["event_id"] for r in ev.mad_outliers(df).collect()}
        z_ids = {r["event_id"] for r in ev.zscore_outliers(df).collect()}
        assert "e10" in mad_ids and "e11" in mad_ids
        assert "e10" not in z_ids  # sigma ~ 288k: 60 is invisible to z


class TestUserGrowth:
    def test_new_returning_cumulative(self, spark):
        rows = [
            (0, _ts(0), 1, "click", 0.0),          # day 1: u1 new
            (1, _ts(10), 2, "click", 0.0),         # day 1: u2 new
            (2, _ts(60 * 24), 1, "click", 0.0),    # day 2: u1 returns
            (3, _ts(60 * 24 + 5), 3, "click", 0.0),# day 2: u3 new
            (4, _ts(60 * 48), 1, "click", 0.0),    # day 3: u1 returns
            (5, _ts(60 * 48 + 1), 1, "view", 0.0), # same user same day
        ]
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        got = [tuple(r) for r in ev.user_growth(df).collect()]
        assert got == [
            ("2024-01-01", 2, 2, 0, 2),
            ("2024-01-02", 2, 1, 1, 3),
            ("2024-01-03", 1, 0, 1, 3),
        ]

    def test_cumulative_equals_distinct_total(self, spark, edf):
        rows = ev.user_growth(edf).collect()
        total = edf.select("user_id").distinct().count()
        assert rows[-1]["cumulative_users"] == total
        assert sum(r["new_users"] for r in rows) == total
        for r in rows:
            assert r["active_users"] == r["new_users"] + r["returning_users"]


class TestValueHistogram:
    def test_hand_computed_buckets(self, spark):
        # group 'a': values 0..10 over k=5 -> width 2; 10 clamps to 4
        rows = [(f"a{i}", "a", float(i)) for i in range(11)]
        # group 'b': constant -> single bucket 0, width 0
        rows += [(f"b{i}", "b", 7.0) for i in range(3)]
        df = spark.createDataFrame(
            rows, "event_id string, event_type string, value double"
        )
        got = {
            (r["event_type"], r["bucket"]): (r["lo"], r["hi"], r["cnt"])
            for r in ev.value_histogram(df, k=5).collect()
        }
        assert got[("a", 0)] == (0.0, 2.0, 2)   # 0, 1
        assert got[("a", 1)] == (2.0, 4.0, 2)   # 2, 3
        assert got[("a", 4)] == (8.0, 10.0, 3)  # 8, 9, and clamped 10
        assert got[("b", 0)] == (7.0, 7.0, 3)
        assert sum(c for _, _, c in got.values()) == len(rows)

    def test_counts_partition_the_group(self, spark):
        import random

        rng = random.Random(5)
        rows = [(f"e{i}", "t", rng.uniform(-3, 9)) for i in range(500)]
        df = spark.createDataFrame(
            rows, "event_id string, event_type string, value double"
        )
        got = ev.value_histogram(df, k=10).collect()
        assert sum(r["cnt"] for r in got) == 500
        assert all(0 <= r["bucket"] <= 9 for r in got)
        # buckets tile [min, max] without gaps in lo/hi arithmetic
        for r in got:
            assert r["hi"] > r["lo"] or r["cnt"] == 500


class TestSeasonalAnomalies:
    def test_spike_flagged_against_same_hour_baseline(self, spark):
        # type 'a': hour 3 fires 2 events every day for 4 days, then a
        # 9-event burst on day 5 (ratio vs baseline (2*4+9)/5=3.4 is
        # 9/3.4 ~ 2.65 > 2).  Hour 5 is steady -> never flagged.
        rows = []
        eid = 0
        for d in range(5):
            n3 = 9 if d == 4 else 2
            for i in range(n3):
                rows.append((eid, _ts(d * 1440 + 3 * 60 + i), 1, "a", 0.0)); eid += 1
            for i in range(3):
                rows.append((eid, _ts(d * 1440 + 5 * 60 + i), 1, "a", 0.0)); eid += 1
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        got = [tuple(r) for r in ev.seasonal_anomalies(df, factor=2.0).collect()]
        assert got == [("a", "2024-01-05", 3, 9, round(17 / 5, 6), round(9 / (17 / 5), 6))]

    def test_absent_buckets_count_as_zero_in_baseline(self, spark):
        # hour 7 fires ONLY on day 3 (6 events).  Wrong baseline
        # (mean over observed buckets) would be 6 -> no flag; correct
        # baseline 6/3 days = 2 -> flagged at ratio 3.
        rows = [(0, _ts(0), 1, "b", 0.0), (1, _ts(1440), 1, "b", 0.0)]  # pin 3 days
        rows += [(10 + i, _ts(2 * 1440 + 7 * 60 + i), 1, "b", 0.0) for i in range(6)]
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        got = {(r["day"], r["hour"]): r["ratio"] for r in
               ev.seasonal_anomalies(df, factor=2.0).collect()}
        assert got[("2024-01-03", 7)] == 3.0


class TestTimeToConvert:
    def test_hand_computed_cohort_stats(self, spark):
        rows = [
            # u1: first at t0, purchase 30 min later
            (0, _ts(0), 1, "click", 0.0), (1, _ts(30), 1, "purchase", 0.0),
            # u2: first at t5 same day, purchase 60 min after first
            (2, _ts(5), 2, "view", 0.0), (3, _ts(65), 2, "purchase", 0.0),
            # u3: same-day first, never converts
            (4, _ts(10), 3, "click", 0.0),
            # u4: first IS a purchase -> ttc 0, next day cohort
            (5, _ts(60 * 24), 4, "purchase", 0.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events as e

        got = {r["cohort_day"]: tuple(r)[1:] for r in e.time_to_convert(df).collect()}
        # day 1: 3 users, 2 converted; latencies sorted [1800, 3600]
        # nearest-rank: median = ceil(0.5*2)=1st -> 1800; p90 = 2nd -> 3600
        assert got["2024-01-01"] == (3, 2, round(2 / 3, 6), 2700.0, 1800.0, 3600.0)
        assert got["2024-01-02"] == (1, 1, 1.0, 0.0, 0.0, 0.0)

    def test_no_conversions_yield_null_latencies(self, spark):
        rows = [(0, _ts(0), 1, "click", 0.0), (1, _ts(9), 2, "view", 0.0)]
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events as e

        r = e.time_to_convert(df).collect()[0]
        assert r["n_converted"] == 0 and r["conversion_rate"] == 0.0
        assert r["median_ttc_s"] is None and r["p90_ttc_s"] is None


class TestGiniConcentration:
    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        return {r["event_type"]: (r["n"], r["total"], r["gini"])
                for r in ev.gini_concentration(df).collect()}

    def test_known_distributions(self, spark):
        rows = [(i, _ts(i), 1, "even", 5.0) for i in range(4)]        # G = 0
        rows += [(10, _ts(0), 1, "conc", 0.0), (11, _ts(1), 1, "conc", 0.0),
                 (12, _ts(2), 1, "conc", 0.0), (13, _ts(3), 1, "conc", 100.0)]
        rows += [(20, _ts(0), 1, "zero", 0.0)]
        got = self._run(spark, rows)
        assert got["even"] == (4, 20.0, 0.0)
        # all mass on the last of 4: G = 2*4*100/(4*100) - 5/4 = 0.75
        assert got["conc"] == (4, 100.0, 0.75)
        assert got["zero"] == (1, 0.0, 0.0)  # no mass -> defined as 0

    def test_bounds_and_ordering_invariance(self, spark):
        import random

        rng = random.Random(2)
        vals = [rng.uniform(0, 10) for _ in range(50)]
        rows = [(i, _ts(i), 1, "t", v) for i, v in enumerate(vals)]
        g1 = self._run(spark, rows)["t"][2]
        rng.shuffle(vals)
        rows2 = [(i, _ts(i), 1, "t", v) for i, v in enumerate(vals)]
        g2 = self._run(spark, rows2)["t"][2]
        assert g1 == g2          # input order must not matter (sorted)
        assert 0.0 <= g1 < 1.0


class TestStickiness:
    def test_hand_dau_wau(self, spark):
        rows = [
            (0, _ts(0), 1, "click", 0.0), (1, _ts(5), 2, "click", 0.0),     # day1: u1,u2
            (2, _ts(60 * 24), 1, "click", 0.0),                              # day2: u1
            (3, _ts(60 * 24 * 9), 3, "click", 0.0),                          # day10: u3
        ]
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        got = {r["day"]: (r["dau"], r["wau"], r["stickiness"])
               for r in ev.stickiness(df, window_days=7).collect()}
        # day1 window covers only day1 activity: wau = 2
        assert got["2024-01-01"] == (2, 2, 1.0)
        # day2 window covers day1+day2: users {1,2}
        assert got["2024-01-02"] == (1, 2, 0.5)
        # day10 is beyond day1/2's 7-day support: wau = 1
        assert got["2024-01-10"] == (1, 1, 1.0)
        # inactive days are not emitted
        assert "2024-01-03" not in got

    def test_wau_at_least_dau(self, spark):
        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        for r in ev.stickiness(e).collect():
            assert r["wau"] >= r["dau"] and 0 < r["stickiness"] <= 1.0


class TestRFMSegments:
    def test_hand_quartiles(self, spark):
        # 4 users: recency [0,2,6,9], frequency [10,6,3,1] -> interpolated
        # quartile boundaries r(1.5,4,6.75), f(2.5,4.5,7)
        rows = []
        eid = 0
        for u, day, n in [(1, 9, 10), (2, 7, 6), (3, 3, 3), (4, 0, 1)]:
            for i in range(n):
                rows.append((eid, _ts(60 * 24 * day + i), u, "click", 1.0))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        got = {r["user_id"]: r for r in ev.rfm_segments(df).collect()}
        assert got[1]["recency_days"] == 0 and got[4]["recency_days"] == 9
        assert [got[u]["r_score"] for u in (1, 2, 3, 4)] == [4, 3, 2, 1]
        assert [got[u]["f_score"] for u in (1, 2, 3, 4)] == [4, 3, 2, 1]
        assert got[1]["segment"] == "champion"
        assert got[2]["segment"] == "loyal"
        assert got[3]["segment"] == "hibernating"
        assert got[4]["segment"] == "hibernating"

    def test_invariants_real_data(self, spark):
        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = ev.rfm_segments(e).collect()
        assert len(out) == e.select("user_id").distinct().count()
        for r in out:
            for s in ("r_score", "f_score", "m_score"):
                assert 1 <= r[s] <= 4
            if r["segment"] == "champion":
                assert r["r_score"] >= 4 and r["f_score"] >= 4
            if r["segment"] == "hibernating":
                assert r["r_score"] <= 2 and r["f_score"] <= 2
            assert r["recency_days"] >= 0 and r["frequency"] >= 1


class TestIntereventGaps:
    def test_hand_gaps(self, spark):
        # one user, one type, events at t=0,10s,30s -> gaps [10, 20]
        rows = [
            (0, _ts(0), 1, "click", 1.0),
            (1, _ts(0).__class__.fromtimestamp(_ts(0).timestamp() + 10), 1, "click", 1.0),
            (2, _ts(0).__class__.fromtimestamp(_ts(0).timestamp() + 30), 1, "click", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        got = ev.interevent_gaps(df).collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_gaps"] == 2 and r["mean_gap"] == 15.0
        # interpolating percentile over [10, 20]: p50=15, p90=19
        assert r["p50_gap"] == 15.0 and r["p90_gap"] == 19.0
        import statistics

        sd, mu = statistics.stdev([10.0, 20.0]), 15.0
        assert abs(r["burstiness"] - round((sd - mu) / (sd + mu), 6)) < 1e-9

    def test_single_gap_null_burstiness(self, spark):
        rows = [(0, _ts(0), 1, "buy", 1.0), (1, _ts(5), 1, "buy", 1.0)]
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        got = ev.interevent_gaps(df).collect()
        assert len(got) == 1 and got[0]["n_gaps"] == 1
        assert got[0]["burstiness"] is None

    def test_gaps_never_span_users_or_types(self, spark):
        # two users each with ONE event of a type -> no gap rows for it
        rows = [
            (0, _ts(0), 1, "view", 1.0),
            (1, _ts(1), 2, "view", 1.0),
            (2, _ts(2), 1, "click", 1.0),
            (3, _ts(9), 1, "click", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id int, ts timestamp, user_id int, event_type string, value double"
        )
        got = {r["event_type"]: r for r in ev.interevent_gaps(df).collect()}
        assert "view" not in got
        assert got["click"]["n_gaps"] == 1 and got["click"]["mean_gap"] == 420.0

    def test_real_data_invariants(self, spark):
        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        for r in ev.interevent_gaps(e).collect():
            assert r["n_gaps"] > 0 and r["mean_gap"] > 0
            assert r["p50_gap"] <= r["p90_gap"]
            if r["burstiness"] is not None:
                assert -1.0 <= r["burstiness"] <= 1.0


class TestCusumChangepoints:
    def _df(self, spark, days_counts, etype="click"):
        rows = []
        eid = 0
        for d, cnt in enumerate(days_counts):
            for _ in range(cnt):
                rows.append((eid, datetime(2024, 1, 1 + d, 12, 0, 0), 1, etype, 1.0))
                eid += 1
        return spark.createDataFrame(
            rows,
            "event_id int, ts timestamp, user_id int, event_type string, value double",
        )

    def test_matches_python_replay(self, spark):
        counts = [5, 6, 4, 7, 5, 20, 22, 21, 19, 23]
        got = ev.cusum_changepoints(self._df(spark, counts), h_mult=3.0).collect()
        mean = sum(counts) / len(counts)
        p, mn, want = 0.0, 0.0, []
        for c in counts:
            p += c - mean
            mn = min(mn, p)
            want.append(p - mn)
        assert len(got) == len(counts)
        for r, w in zip(sorted(got, key=lambda r: r["day"]), want):
            assert abs(r["cusum"] - w) < 2e-6

    def test_step_shift_fires_after_step_only(self, spark):
        counts = [5, 5, 5, 5, 5, 30, 30, 30, 30, 30]
        got = sorted(
            ev.cusum_changepoints(self._df(spark, counts), h_mult=3.0).collect(),
            key=lambda r: r["day"],
        )
        # pre-step days never flag; the post-step regime does
        assert all(r["shift"] == 0 for r in got[:5])
        assert any(r["shift"] == 1 for r in got[5:])

    def test_stationary_no_shift(self, spark):
        counts = [10, 11, 9, 10, 10, 9, 11, 10]
        got = ev.cusum_changepoints(self._df(spark, counts), h_mult=3.0).collect()
        assert all(r["shift"] == 0 for r in got)


class TestScd2History:
    def test_runs_collapse_and_intervals(self, spark):
        rows = [
            (0, datetime(2024, 1, 1, 10), 1, "e", 1.0, "A"),
            (1, datetime(2024, 1, 1, 11), 1, "e", 1.0, "A"),
            (2, datetime(2024, 1, 1, 12), 1, "e", 1.0, "B"),
            (3, datetime(2024, 1, 1, 13), 1, "e", 1.0, "A"),
            (4, datetime(2024, 1, 1, 9), 2, "e", 1.0, "Z"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id int, ts timestamp, user_id int, event_type string,"
            " value double, attr string",
        )
        got = ev.scd2_history(df, attr=F.col("attr")).collect()
        u1 = [r for r in got if r["user"] == 1]
        assert [r["attr_value"] for r in u1] == ["A", "B", "A"]
        assert [r["n_events"] for r in u1] == [2, 1, 1]
        # each interval closes at the next one's open; last is current
        assert u1[0]["valid_to"] == u1[1]["valid_from"]
        assert u1[1]["valid_to"] == u1[2]["valid_from"]
        assert u1[2]["valid_to"] is None and u1[2]["is_current"] == 1
        assert u1[0]["is_current"] == 0
        u2 = [r for r in got if r["user"] == 2]
        assert len(u2) == 1 and u2[0]["is_current"] == 1

    def test_single_run_per_user(self, spark):
        rows = [
            (i, datetime(2024, 1, 1, 1 + i), 1, "e", 1.0, "X") for i in range(4)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id int, ts timestamp, user_id int, event_type string,"
            " value double, attr string",
        )
        got = ev.scd2_history(df, attr=F.col("attr")).collect()
        assert len(got) == 1 and got[0]["n_events"] == 4
