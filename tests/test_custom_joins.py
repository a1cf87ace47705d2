"""As-of and range join operators against hand-computed fixtures."""

from pyspark.sql import functions as F

from laradb_spark.operators import asof_join, range_self_join


def test_asof_backward_basic(spark):
    trades = spark.createDataFrame(
        [(1, 100, "t1"), (1, 205, "t2"), (2, 150, "t3"), (3, 50, "t4")],
        "sym long, t long, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, 90, 10), (1, 100, 11), (1, 200, 12), (2, 160, 20)],
        "sym long, t long, px long",
    )
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="t",
                    payload=["px"], tiebreak="px")
    got = {r.trade: r.px for r in out.collect()}
    # t1@100: quote@100 visible (inclusive) → 11; t2@205 → quote@200 → 12
    # t3@150: only quote@160 is later → None; t4: no quotes for sym 3 → None
    assert got == {"t1": 11, "t2": 12, "t3": None, "t4": None}


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 100, "a")], "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 90, 1), (1, 120, 2), (1, 150, 3)], "k long, t long, v long"
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    payload=["v"], direction="forward", tiebreak="v")
    assert out.collect()[0].v == 2  # earliest at/after 100


def test_asof_equal_time_tiebreak(spark):
    left = spark.createDataFrame([(1, 100, "a")], "k long, t long, tag string")
    right = spark.createDataFrame([(1, 100, 7), (1, 100, 9)], "k long, t long, v long")
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    payload=["v"], tiebreak="v")
    assert out.collect()[0].v == 9  # largest tiebreak among same-time rows


def test_range_self_join_pairs(spark):
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 25, 11), (1, 31, 12), (1, 100, 13), (2, 0, 20)],
        "k long, t long, id long",
    )
    pairs = {(r.id_a, r.id_b) for r in
             range_self_join(df, key="k", order_col="t", id_col="id", max_gap=30).collect()}
    # |0-25|<=30 ✓, |25-31|<=30 ✓, |0-31|>30 ✗, 100 isolated, key 2 alone
    assert pairs == {(10, 11), (11, 12)}


def test_range_join_cross_bucket(spark):
    # partner in the EARLIER bucket than the smaller id (regression: probe
    # must cover b-1)
    df = spark.createDataFrame([(1, 29, 5), (1, 31, 4)], "k long, t long, id long")
    pairs = {(r.id_a, r.id_b) for r in
             range_self_join(df, key="k", order_col="t", id_col="id", max_gap=30).collect()}
    assert pairs == {(4, 5)}


def test_asof_payload_rides_as_one_row(spark):
    # Regression: payload columns must come from the SAME right row. Here
    # the latest quote has px=NULL, qty=5 — per-column carry would leak the
    # older row's px=11 into it.
    left = spark.createDataFrame([(1, 200, "a")], "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 100, 11, 3), (1, 150, None, 5)], "k long, t long, px long, qty long"
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    payload=["px", "qty"], tiebreak="qty")
    row = out.collect()[0]
    assert row.px is None and row.qty == 5


def test_asof_forward_equal_time_tiebreak(spark):
    # forward direction: among same-time right rows the LARGEST tiebreak
    # wins (regression: desc ordering made the smallest win).
    left = spark.createDataFrame([(1, 100, "a")], "k long, t long, tag string")
    right = spark.createDataFrame([(1, 100, 7), (1, 100, 9)], "k long, t long, v long")
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    payload=["v"], direction="forward", tiebreak="v")
    assert out.collect()[0].v == 9


def test_asof_rejects_string_tiebreak(spark):
    import pytest

    left = spark.createDataFrame([(1, 100, "a")], "k long, t long, tag string")
    right = spark.createDataFrame([(1, 90, "x")], "k long, t long, v string")
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(left, right, on="k", left_time="t", right_time="t",
                  payload=["v"], tiebreak="v")


def test_point_in_time_join_interval_semantics(spark):
    from laradb_spark.operators.joins import point_in_time_join

    dim = spark.createDataFrame(
        [
            (1, "old", 0, 100),     # closed version
            (1, "new", 100, None),  # open (current) version
            (2, "only", 50, None),
        ],
        "k long, seg string, valid_from long, valid_to long",
    )
    facts = spark.createDataFrame(
        [(1, 99, "a"), (1, 100, "b"), (1, 150, "c"), (2, 10, "d"), (3, 60, "e")],
        "fk long, day long, tag string",
    )
    out = {
        r.tag: r.seg
        for r in point_in_time_join(facts, dim, "fk", "k", "day").collect()
    }
    # boundary day 100 belongs to the NEW version (valid_to exclusive)
    assert out == {"a": "old", "b": "new", "c": "new"}
    # d (before key 2's first version) and e (unknown key) don't match


def test_merge_upsert_semantics(spark):
    from laradb_spark.operators.scd import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (9, "new", "U")], "k long, v string, op string"
    )
    got = {r.k: r.v for r in merge_upsert(target, changes, "k", op_col="op").collect()}
    assert got == {1: "a", 2: "B", 9: "new"}  # 2 replaced, 3 deleted, 9 inserted
    # NULL op is an UPSERT, never a silent delete (three-valued-logic trap)
    null_op = spark.createDataFrame([(2, "Z", None)], "k long, v string, op string")
    got_null = {r.k: r.v for r in merge_upsert(target, null_op, "k", op_col="op").collect()}
    assert got_null == {1: "a", 2: "Z", 3: "c"}
    # without op_col every change row is an upsert
    ups = spark.createDataFrame([(1, "A")], "k long, v string")
    got2 = {r.k: r.v for r in merge_upsert(target, ups, "k").collect()}
    assert got2 == {1: "A", 2: "b", 3: "c"}


def test_merge_upsert_duplicate_key_batch(spark):
    """MERGE INTO semantics: a duplicate-key change batch raises unless a
    sequence column collapses it last-wins (the winning row's op decides
    — a trailing delete deletes even when an earlier upsert exists)."""
    import pytest

    from laradb_spark.operators.scd import merge_upsert

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dup = spark.createDataFrame(
        [(2, "B1", "U", 10), (2, "B2", "U", 20), (1, "A", "U", 5), (1, None, "D", 6)],
        "k long, v string, op string, seq long",
    )
    with pytest.raises(ValueError, match="key-unique"):
        merge_upsert(target, dup.drop("seq"), "k", op_col="op")
    got = {
        r.k: r.v
        for r in merge_upsert(target, dup, "k", op_col="op", seq_col="seq").collect()
    }
    # key 2: seq 20 wins (B2); key 1: the delete at seq 6 beats the upsert
    assert got == {2: "B2"}
    # seq collapse without op_col, and the seq column is not emitted
    merged = merge_upsert(target, dup.drop("op"), "k", seq_col="seq")
    assert "seq" not in merged.columns
    assert {r.k: r.v for r in merged.collect()} == {1: None, 2: "B2"}
