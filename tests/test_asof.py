"""as-of join edge semantics: equal-timestamp visibility, missing
prior state, and the deterministic tiebreak."""

from __future__ import annotations

from aggregation_duckdb_spark.operators.asof import asof_join


def test_asof_edges(spark):
    left = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 10), (3, 1, 20), (4, 2, 7)],
        "id long, k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0)],
        "k long, t long, v double")
    out = {r["id"]: r["v_asof"] for r in
           asof_join(left, right, on="t", by="k", value_cols=["v"]).collect()}
    assert out[1] is None          # before any right row
    assert out[2] == 100.0         # equal timestamp IS visible (<=)
    assert out[3] == 150.0         # latest at-or-before
    assert out[4] is None          # key with no right rows at all


def test_asof_null_right_value_not_skipped(spark):
    """A matched right row whose value is genuinely NULL must yield
    NULL — not carry a stale older value past it (DuckDB ASOF returns
    the row, NULLs included)."""
    left = spark.createDataFrame([(1, 1, 30)], "id long, k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, None)], "k long, t long, v double")
    row = asof_join(left, right, on="t", by="k",
                    value_cols=["v", "t"]).first()
    assert row["v_asof"] is None     # the t=20 row, not the stale 5.0
    assert row["t_asof"] == 20       # fields come from the SAME row


def test_asof_tiebreak_dedupes_simultaneous_rows(spark):
    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 1.0, 1), (1, 10, 2.0, 2)],
        "k long, t long, v double, seq long")
    out = asof_join(left, right, on="t", by="k", value_cols=["v"],
                    tiebreak="seq").collect()
    assert out[0]["v_asof"] == 2.0  # greatest tiebreak wins


def test_asof_null_keys_and_times_never_match(spark):
    """SQL join semantics: NULL keys/timestamps on the right can never
    match; left rows with NULL key/time get NULL state (= DuckDB ASOF)."""
    left = spark.createDataFrame(
        [(1, 1, 10), (2, None, 10), (3, 1, None)],
        "id long, k long, t long")
    right = spark.createDataFrame(
        [(None, 5, 1.0), (1, None, 2.0), (1, 5, 3.0)],
        "k long, t long, v double")
    out = {r["id"]: r["v_asof"] for r in
           asof_join(left, right, on="t", by="k",
                     value_cols=["v"]).collect()}
    assert out[1] == 3.0    # only the fully non-NULL right row matches
    assert out[2] is None   # NULL left key matches nothing
    assert out[3] is None   # NULL left time matches nothing


def test_asof_nearest_directions_and_ties(spark):
    """Nearest-event semantics: backward-only user, forward-only user,
    equidistant tie (backward wins), simultaneous rights (greatest
    tiebreak wins), and a keyless left row (all NULLs)."""
    from datetime import datetime
    from aggregation_duckdb_spark.operators.asof import asof_nearest
    t = lambda m: datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame(
        [(1, 10, t(30)),   # user 10: clicks before AND after, after closer
         (2, 20, t(30)),   # user 20: only a click before
         (3, 30, t(30)),   # user 30: only a click after
         (4, 40, t(30)),   # user 40: equidistant before/after -> backward
         (5, 50, t(30)),   # user 50: two simultaneous nearest clicks
         (6, 99, t(30))],  # user 99: no clicks at all
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(101, 10, t(10), 1.0), (102, 10, t(35), 2.0),
         (103, 20, t(0), 3.0),
         (104, 30, t(59), 4.0),
         (105, 40, t(20), 5.0), (106, 40, t(40), 6.0),
         (107, 50, t(25), 7.0), (108, 50, t(25), 8.0)],
        "event_id long, user_id long, ts timestamp, value double")
    out = {r.event_id: r for r in
           asof_nearest(left, right.select("user_id", "ts", "value",
                                           "event_id"),
                        on="ts", by="user_id", value_cols=["value"],
                        tiebreak="event_id").collect()}
    assert out[1].value_near == 2.0 and out[1].gap_us == 5 * 60_000_000
    assert out[2].value_near == 3.0 and out[2].gap_us == 30 * 60_000_000
    assert out[3].value_near == 4.0 and out[3].gap_us == 29 * 60_000_000
    assert out[4].value_near == 5.0   # equidistant -> backward (earlier)
    assert out[5].value_near == 8.0   # simultaneous -> greatest event_id
    assert out[6].value_near is None and out[6].gap_us is None
