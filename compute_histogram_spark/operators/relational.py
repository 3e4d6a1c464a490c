"""Relational coverage: joins, group aggregates, top-k — the obligations the
reference's decile SQL implies (CTE/cross-join/window/group-agg,
compute_histogram.sql:1-3) extended to the star schema the engine serves.

Cross-engine determinism: money columns are summed in integer *cents*
(``round(x*100)`` -> BIGINT). Floating-point summation order differs between
engines (and between Spark partitions run-to-run); integer sums are exact and
associative, so results are bit-identical everywhere and at any parallelism.
The final division back to dollars is a single double op on identical
integers. Overflow headroom: int64 holds ~9.2e18 — cents-scale sums are safe
beyond SF 10k; the charge product (cents x 100 x 100) is safe through ~SF100,
beyond which the same pattern moves to DECIMAL(38,x).

Scale notes: dimension tables (region/nation/customer/supplier/part) are
broadcast — no shuffle of the fact table for the join; only the final
aggregations shuffle, post map-side partial aggregation. AQE handles skewed
group keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def cents(col: Column | str) -> Column:
    """Dollars (2-decimal double) -> exact integer cents."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary with cents-exact money math."""
    li = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")  # discount fraction at 1e-2 scale
    tax_c = cents("l_tax")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            qty_c.alias("qc"),
            price_c.alias("pc"),
            disc_c.alias("dc"),
            (price_c * (100 - disc_c)).alias("disc_pc"),
            (price_c * (100 - disc_c) * (100 + tax_c)).alias("charge_pc"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum("qc") / 100.0).alias("sum_qty"),
            (F.sum("pc") / 100.0).alias("sum_base_price"),
            (F.sum("disc_pc") / 10000.0).alias("sum_disc_price"),
            (F.sum("charge_pc") / 1000000.0).alias("sum_charge"),
            (F.sum("qc") / F.count(F.lit(1)) / 100.0).alias("avg_qty"),
            (F.sum("pc") / F.count(F.lit(1)) / 100.0).alias("avg_price"),
            (F.sum("dc") / F.count(F.lit(1)) / 100.0).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_customers(customer: DataFrame, orders: DataFrame, k: int = 10) -> DataFrame:
    """Highest-spend customers: broadcast-joined dim, exact cents sum,
    deterministic tie-break, TakeOrdered top-k (no global sort shuffle)."""
    joined = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    )
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(
            (F.sum(cents("o_totalprice")) / 100.0).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(k)
    )


def region_revenue(
    region: DataFrame, nation: DataFrame, customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Revenue by region/nation through a 4-way join; every dimension side is
    broadcast so the orders fact never shuffles before aggregation."""
    j = (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        j.groupBy("r_name", "n_name")
        .agg(
            (F.sum(cents("o_totalprice")) / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


def top_n_per_group(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    n: int,
) -> DataFrame:
    """Generic partitioned top-N (row_number window). Deterministic only if
    ``order_cols`` includes a tie-breaking unique key."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
    )
