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
