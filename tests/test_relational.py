"""Relational operator semantics: rollup levels, pivot zero-fill, set ops,
anti join, and the salted join's equivalence to the plain join."""

from pyspark.sql import Row, functions as F

from compute_histogram_spark.operators import relational as R
from compute_histogram_spark.sources.tables import load


def test_rollup_has_three_levels(spark, sf_dir):
    out = R.rollup_revenue(
        load(spark, sf_dir, "region"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
    ).collect()
    grand = [r for r in out if r["r_name"] == "ALL" and r["n_name"] == "ALL"]
    region_sub = [r for r in out if r["r_name"] != "ALL" and r["n_name"] == "ALL"]
    leaf = [r for r in out if r["r_name"] != "ALL" and r["n_name"] != "ALL"]
    assert len(grand) == 1
    assert len(region_sub) >= 1
    # subtotals reconcile exactly (cents-integer sums are associative)
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in leaf)
    assert abs(grand[0]["revenue"] - sum(r["revenue"] for r in leaf)) < 1e-6


def test_pivot_zero_fill_and_row_sums(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    out = R.orders_pivot(orders).collect()
    total = sum(sum(r[p] for p in R.ORDER_PRIORITIES) for r in out)
    assert total == orders.count()
    assert all(r[p] >= 0 for r in out for p in R.ORDER_PRIORITIES)


def test_set_ops_disjoint_and_intersect(spark):
    ev = spark.createDataFrame(
        [
            Row(user_id=1, event_type="purchase"),
            Row(user_id=1, event_type="click"),
            Row(user_id=2, event_type="purchase"),
            Row(user_id=3, event_type="click"),
            Row(user_id=3, event_type="click"),
        ]
    )
    both = [r["user_id"] for r in R.users_in_both(ev, "purchase", "click").collect()]
    only = [r["user_id"] for r in R.users_only_in(ev, "click", "purchase").collect()]
    assert both == [1]
    assert only == [3]  # user 1 clicked but also purchased -> excluded


def test_lapsed_customers_anti_join(spark):
    cust = spark.createDataFrame(
        [Row(c_custkey=1, c_name="a"), Row(c_custkey=2, c_name="b")]
    )
    orders = spark.createDataFrame(
        [Row(o_custkey=1, o_orderdate="2001-06-01")]
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    out = R.lapsed_customers(cust, orders, "2001-01-01").collect()
    assert [r["c_custkey"] for r in out] == [2]


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    plain = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    salted = R.salted_join(orders, customer, "o_custkey", "c_custkey", salt=4).count()
    assert salted == plain


def test_top_n_per_group(spark):
    df = spark.createDataFrame(
        [(g, i, g * 10 + i) for g in (1, 2) for i in range(5)],
        "grp int, id int, score int",
    )
    out = R.top_n_per_group(df, ["grp"], [F.desc("score"), F.asc("id")], 2)
    got = {(r["grp"], r["id"], r["rank"]) for r in out.collect()}
    assert got == {(1, 4, 1), (1, 3, 2), (2, 4, 1), (2, 3, 2)}


def test_write_parquet_partitioned_roundtrip(spark, sf_dir, tmp_path):
    from compute_histogram_spark.sources.sinks import write_parquet

    orders = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    write_parquet(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)


def test_late_order_priority_rewrite_equals_exists_semi_join(spark, sf_dir):
    # the agg-then-join rewrite must be observationally identical to the
    # direct correlated-EXISTS plan (left_semi with the non-equi predicate)
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    rewritten = {
        (r["o_orderpriority"], r["order_count"])
        for r in R.late_order_priority(orders, lineitem).collect()
    }
    semi = (
        orders.join(
            lineitem,
            (orders["o_orderkey"] == lineitem["l_orderkey"])
            & (lineitem["l_shipdate"] > orders["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .collect()
    )
    assert rewritten == {(r["o_orderpriority"], r["order_count"]) for r in semi}


def test_shipping_priority_broadcasts_customer(spark, sf_dir):
    plan = R.shipping_priority(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
    )._jdf.queryExecution().executedPlan().toString()
    # the segment-filtered customer dim must come in as a broadcast, and the
    # only sort-merge/shuffle join allowed is the orders-lineitem equi-join
    assert "BroadcastHashJoin" in plan


def test_returned_item_customers_values(spark, sf_dir):
    out = R.returned_item_customers(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        k=5,
    ).collect()
    assert len(out) == 5
    revs = [r["revenue"] for r in out]
    assert revs == sorted(revs, reverse=True)
    assert all(r["n_name"] for r in out)


def test_fuzzy_name_pairs_semantics(spark):
    df = spark.createDataFrame(
        [
            Row(p_partkey=1, p_name="blue bolt"),
            Row(p_partkey=2, p_name="blue bolts"),   # distance 1, same block
            Row(p_partkey=3, p_name="glue bolt"),    # distance 1 but block 'g'
            Row(p_partkey=4, p_name="blue widget"),  # too far
        ]
    )
    out = R.fuzzy_name_pairs(df).collect()
    assert [(r["id_1"], r["id_2"], r["distance"]) for r in out] == [(1, 2, 1)]
