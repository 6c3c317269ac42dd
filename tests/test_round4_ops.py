"""Planted-scenario semantics for the round-4 behavioral operators.

Oracle parity (test_contract) proves Spark and DuckDB agree; these
tests pin what the agreed answer MUST BE on hand-built event streams
— lookahead-freedom for attribution and temporal joins, transitive
bridging for interval merge, run-collapsing for SCD2.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_release_spark.plans.registry import specs

T0 = datetime.datetime(2024, 6, 1, 12, 0, 0)


def _ts(minutes: float) -> datetime.datetime:
    return T0 + datetime.timedelta(minutes=minutes)


#: (event_id, minutes, user_id, event_type, value)
_EVENTS = [
    # user 1: view -> purchase -> later view (must NOT attribute).
    (101, 0.0, 1, "view", 5.0),
    (102, 60.0, 1, "purchase", 9.99),
    (103, 120.0, 1, "view", 1.0),
    # user 2: purchase with no prior touch -> NULL attribution.
    (201, 0.0, 2, "purchase", 3.5),
    # user 3: click then view then purchase; touch older than 7 days
    # is outside the lookback.
    (300, -8 * 24 * 60.0, 3, "click", 0.5),  # 8 days before: excluded
    (301, 0.0, 3, "click", 0.5),
    (302, 30.0, 3, "view", 0.5),
    (303, 45.0, 3, "purchase", 20.0),
    # user 4: interval-merge shapes — 0 and 30 min overlap via the
    # ±30 min pads; 600 min is its own island.
    (401, 0.0, 4, "error", 1.0),
    (402, 30.0, 4, "error", 1.0),
    (403, 600.0, 4, "error", 1.0),
    # user 5: SCD2 run-collapsing — view,view,click = 2 versions.
    (501, 0.0, 5, "view", 1.0),
    (502, 10.0, 5, "view", 1.0),
    (503, 20.0, 5, "click", 1.0),
    # user 6: temporal join — purchase between segment changes.
    (601, 0.0, 6, "view", 1.0),
    (602, 100.0, 6, "click", 1.0),
    (603, 50.0, 6, "purchase", 7.0),   # while segment = view
    (604, 150.0, 6, "purchase", 8.0),  # after change to click
]


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory) -> str:
    tmp = tmp_path_factory.mktemp("round4_events")
    tbl = pa.table(
        {
            "event_id": pa.array([e[0] for e in _EVENTS], pa.int64()),
            "ts": pa.array([_ts(e[1]) for e in _EVENTS], pa.timestamp("us")),
            "user_id": pa.array([e[2] for e in _EVENTS], pa.int64()),
            "event_type": pa.array([e[3] for e in _EVENTS]),
            "value": pa.array([e[4] for e in _EVENTS], pa.float64()),
            "props": pa.array(["{}"] * len(_EVENTS)),
        }
    )
    pq.write_table(tbl, str(tmp / "events.parquet"))
    return str(tmp)


def test_attribution_no_lookahead_and_lookback_bound(spark, planted_dir):
    out = {
        r["purchase_id"]: r.asDict()
        for r in specs()["e17_attribution"].fn(spark, planted_dir).collect()
    }
    # user 1: the later view (103) must not attribute; 101 is both ends.
    assert out[102]["first_touch_id"] == 101
    assert out[102]["last_touch_id"] == 101
    # user 2: unattributed purchase still emits, with NULL credit.
    assert out[201]["first_touch_id"] is None
    assert out[201]["last_touch_id"] is None
    # user 3: 8-day-old touch excluded; first=301 (click), last=302.
    assert out[303]["first_touch_id"] == 301
    assert out[303]["first_touch_type"] == "click"
    assert out[303]["last_touch_id"] == 302
    assert out[303]["last_touch_type"] == "view"


def test_interval_merge_bridges_transitively(spark, planted_dir):
    rows = [
        r.asDict()
        for r in specs()["e22_interval_merge"].fn(spark, planted_dir).collect()
        if r["user_id"] == 4
    ]
    by_events = sorted(rows, key=lambda r: r["start_us"])
    assert [r["n_events"] for r in by_events] == [2, 1]
    merged = by_events[0]
    # merged interval spans min start .. max end of its two members.
    assert merged["end_us"] - merged["start_us"] == (30 + 60) * 60 * 1_000_000


def test_scd2_collapses_runs(spark, planted_dir):
    rows = sorted(
        (
            r.asDict()
            for r in specs()["e20_scd2_history"].fn(spark, planted_dir).collect()
            if r["user_id"] == 5
        ),
        key=lambda r: r["version"],
    )
    assert [r["attr"] for r in rows] == ["view", "click"]
    assert rows[0]["is_current"] == 0
    assert rows[1]["is_current"] == 1
    assert rows[1]["valid_to_us"] is None
    # view version closes 1 µs before the click version opens.
    assert rows[0]["valid_to_us"] == rows[1]["valid_from_us"] - 1


def test_temporal_join_picks_version_valid_at_fact_time(spark, planted_dir):
    out = {
        r["purchase_id"]: r.asDict()
        for r in specs()["c22_join_temporal"].fn(spark, planted_dir).collect()
        if r["user_id"] == 6
    }
    assert out[603]["segment_at_purchase"] == "view"   # before the change
    assert out[604]["segment_at_purchase"] == "click"  # after the change


def test_markov_counts_transitions_in_stream_order(spark, planted_dir):
    rows = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in specs()["e21_markov_transitions"].fn(spark, planted_dir).collect()
    }
    # user 1 contributes view->purchase and purchase->view.
    assert rows[("view", "purchase")] >= 1
    assert rows[("purchase", "view")] >= 1
    # shares are row-normalized basis points: each from-row sums ≤ 10000.
    shares = {}
    for r in specs()["e21_markov_transitions"].fn(spark, planted_dir).collect():
        shares.setdefault(r["from_type"], 0)
        shares[r["from_type"]] += r["share_bp"]
    assert all(v <= 10000 for v in shares.values())
