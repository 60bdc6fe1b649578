"""funnel_stages: ordered first-touch funnel semantics, pinned on a
hand-computed fixture (strictly-after boundaries, re-entry, missing
stages) plus a plan check (no cartesian)."""

import datetime as dt

import pytest

from keras_ocr_spark.operators.funnel import funnel_stages


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: clean view -> click -> purchase
        (1, _ts(1, 1), "view"),
        (1, _ts(1, 2), "click"),
        (1, _ts(1, 3), "purchase"),
        # u2: click BEFORE first view, purchase after — click must not
        # count (strictly after first view), so u2 stops at stage 0.
        (2, _ts(1, 1), "click"),
        (2, _ts(1, 2), "view"),
        (2, _ts(1, 3), "purchase"),
        # u3: view + click at the SAME instant — strict > excludes it.
        (3, _ts(2, 5), "view"),
        (3, _ts(2, 5), "click"),
        # u4: view then click, no purchase: stops at stage 1.
        (4, _ts(3, 1), "view"),
        (4, _ts(3, 2), "click"),
        # u5: purchase only — never enters the funnel.
        (5, _ts(4, 1), "purchase"),
        # u6: multiple views; FIRST view is the entry, later click ok.
        (6, _ts(5, 1), "view"),
        (6, _ts(5, 9), "view"),
        (6, _ts(5, 4), "click"),
        (6, _ts(5, 5), "purchase"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_counts(events):
    got = {
        (r.stage_idx, r.stage): r.n_users
        for r in funnel_stages(events, ["view", "click", "purchase"]).collect()
    }
    # stage 0: u1, u2, u3, u4, u6 viewed
    # stage 1: clicks strictly after first view -> u1, u4, u6 (u2 clicked
    #          before viewing, u3 clicked at the same instant)
    # stage 2: purchases strictly after stage-1 entry -> u1, u6
    assert got == {(0, "view"): 5, (1, "click"): 3, (2, "purchase"): 2}


def test_funnel_single_stage_and_empty_stages(events):
    out = funnel_stages(events, ["purchase"]).collect()
    assert [(r.stage_idx, r.stage, r.n_users) for r in out] == [(0, "purchase", 4)]
    with pytest.raises(ValueError):
        funnel_stages(events, [])


def test_funnel_zero_survivors_stage_still_emits_row(events):
    out = funnel_stages(events, ["purchase", "signup"]).collect()
    assert [(r.stage_idx, r.n_users) for r in sorted(out, key=lambda r: r.stage_idx)] == [
        (0, 4),
        (1, 0),
    ]


def test_funnel_plan_no_cartesian(events):
    plan = (
        funnel_stages(events, ["view", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


class TestCohortRetention:
    def test_hand_computed_triangle(self, spark):
        from keras_ocr_spark.operators.funnel import cohort_retention

        day = 86_400_000_000
        rows = [
            # u1 first active week 0, returns weeks 1 and 3
            (1, dt.datetime(1970, 1, 2)),
            (1, dt.datetime(1970, 1, 9)),
            (1, dt.datetime(1970, 1, 24)),
            # u2 first active week 0 only (two events same week dedupe)
            (2, dt.datetime(1970, 1, 3)),
            (2, dt.datetime(1970, 1, 5)),
            # u3 first active week 1, returns week 2
            (3, dt.datetime(1970, 1, 10)),
            (3, dt.datetime(1970, 1, 16)),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r.cohort_week, r.week_offset): r.n_users
            for r in cohort_retention(df, week_us=7 * day).collect()
        }
        assert got == {
            (0, 0): 2,  # u1, u2
            (0, 1): 1,  # u1
            (0, 3): 1,  # u1
            (1, 0): 1,  # u3
            (1, 1): 1,  # u3
        }


class TestTfidfTopTerms:
    def test_scores_and_ranks(self, spark):
        import math

        from keras_ocr_spark.operators.retrieval import tfidf_top_terms

        df = spark.createDataFrame(
            [(0, "cat cat dog"), (1, "dog fish"), (2, "fish fish fish")],
            "doc_id long, text string",
        )
        out = {(r.id, r.term): (r.score, r.rk) for r in tfidf_top_terms(df, k=2).collect()}

        def s(tf, df_):
            return math.floor(tf * math.log(4.0 / (df_ + 1.0)) * 1e6 + 0.5)

        # doc 0: cat tf=2 df=1, dog tf=1 df=2 -> cat ranks 1
        assert out[(0, "cat")] == (s(2, 1), 1)
        assert out[(0, "dog")] == (s(1, 2), 2)
        # doc 1: dog and fish both tf=1 df=2 -> tie cut by term ASC
        assert out[(1, "dog")][1] == 1 and out[(1, "fish")][1] == 2
        # doc 2: only one distinct term -> a single row, k=2 notwithstanding
        assert out[(2, "fish")] == (s(3, 2), 1)
        assert len([k for k in out if k[0] == 2]) == 1

    def test_k_validation(self, spark):
        from keras_ocr_spark.operators.retrieval import tfidf_top_terms

        df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            tfidf_top_terms(df, k=0)
