"""Time-series primitives: resample+ffill and sweep-line concurrency."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from keras_ocr_spark.operators.timeseries import (
    resample_ffill_daily,
    sweep_max_concurrency,
    sweep_max_concurrency_naive,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(day, hour=0, minute=0, second=0):
    return T0 + dt.timedelta(days=day, hours=hour, minutes=minute, seconds=second)


class TestResampleFfill:
    def _events(self, spark, rows):
        return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    def test_gap_days_filled_forward(self, spark):
        df = self._events(
            spark,
            [
                (1, _ts(0, 10), 2.0),
                (1, _ts(0, 12), 3.0),  # day 0 total 5.0
                (1, _ts(3, 1), 7.0),  # days 1-2 missing -> carry 5.0
            ],
        )
        out = {
            (r["day_idx"] - 19723): (r["filled_value"], r["has_event"])
            for r in resample_ffill_daily(df).collect()
        }
        assert out == {
            0: (5.0, 1),
            1: (5.0, 0),
            2: (5.0, 0),
            3: (7.0, 1),
        }

    def test_spine_is_per_key_observed_span(self, spark):
        df = self._events(
            spark,
            [
                (1, _ts(0), 1.0),
                (1, _ts(2), 1.0),
                (2, _ts(5), 1.0),  # user 2: single day, no fill rows
            ],
        )
        out = resample_ffill_daily(df)
        counts = {r["key"]: r["n"] for r in out.groupBy("key").agg(F.count("*").alias("n")).collect()}
        assert counts == {1: 3, 2: 1}
        # first spine day always has an event -> filled_value never NULL
        assert out.filter(F.col("filled_value").isNull()).count() == 0

    def test_midnight_boundary_is_exact_integer_division(self, spark):
        # one microsecond before midnight stays on the earlier day; the
        # exact `div` path must not let double rounding flip it.
        df = self._events(
            spark,
            [
                (1, _ts(1) - dt.timedelta(microseconds=1), 1.0),
                (1, _ts(1), 2.0),
            ],
        )
        out = {r["day_idx"] - 19723: r["filled_value"] for r in resample_ffill_daily(df).collect()}
        assert out == {0: 1.0, 1: 2.0}


class TestSweepMaxConcurrency:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_type string, ts timestamp, event_id long"
        )

    def test_golden_overlap_counts(self, spark):
        # type a: 3 intervals opening within 10 min of each other -> peak 3
        # type b: two touching intervals (end-exclusive) -> peak 1
        df = self._events(
            spark,
            [
                ("a", _ts(0, 0, 0), 1),
                ("a", _ts(0, 0, 5), 2),
                ("a", _ts(0, 0, 9), 3),
                ("a", _ts(0, 1, 0), 4),
                ("b", _ts(0, 0, 0), 5),
                ("b", _ts(0, 0, 10), 6),
            ],
        )
        out = {r["grp"]: r.asDict() for r in sweep_max_concurrency(df).collect()}
        assert out["a"]["max_concurrent"] == 3
        assert out["a"]["n_intervals"] == 4
        # peak is first attained when the third interval opens (00:09)
        assert out["a"]["peak_us"] == int((_ts(0, 0, 9) - dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000
        assert out["b"]["max_concurrent"] == 1

    @pytest.mark.parametrize("bucket_width_us", [1, 600_000_000, 10**15])
    def test_bucketed_equals_naive(self, spark, bucket_width_us):
        # seeded irregular data incl. exact ts collisions across types
        rows = []
        for i in range(400):
            rows.append(
                (
                    "t" + str(i % 3),
                    _ts(0, (i * 7) % 24, (i * 13) % 60, (i * 29) % 60),
                    i,
                )
            )
        df = self._events(spark, rows)
        fast = sorted(
            map(tuple, sweep_max_concurrency(df, bucket_width_us=bucket_width_us).collect())
        )
        slow = sorted(map(tuple, sweep_max_concurrency_naive(df).collect()))
        assert fast == slow

    def test_plan_is_broadcast_join_no_python(self, spark):
        df = self._events(spark, [("a", _ts(0), 1)])
        plan = (
            sweep_max_concurrency(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan


class TestUnpivotQuery:
    def test_long_form_row_count_and_values(self, spark):
        from keras_ocr_spark.driver_queries import QUERIES

        fn, _ = QUERIES["unpivot_brand_metrics"]
        out = fn(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        brands = {r["p_brand"] for r in rows}
        assert len(rows) == 3 * len(brands)
        by_metric = {}
        for r in rows:
            by_metric.setdefault(r["metric"], 0)
            by_metric[r["metric"]] += 1
        assert set(by_metric) == {"total_retail", "avg_size", "n_parts"}
        # n_parts values sum to the part table row count
        n = sum(r["value"] for r in rows if r["metric"] == "n_parts")
        assert n == spark.read.parquet("/root/testdata/sf0.001/part.parquet").count()
