"""Query registry: every operator exposed as a named (Spark query, DuckDB
oracle SQL) pair for the driver's correctness harness.

Contract (see __spark_entry__.py): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame whose column NAMES and VALUES
match the oracle SQL run by DuckDB over the same parquet tables. All
computed columns are aliased identically on both sides; cross-engine
float determinism notes are inline where it matters.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

from compute_histogram_spark.operators import histogram as H
from compute_histogram_spark.operators import deciles as D
from compute_histogram_spark.operators import relational as R
from compute_histogram_spark.operators import windows as W
from compute_histogram_spark.sources.tables import load

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2 A1-A2: min/max pass (main.py:127-149, 206-219)
# ---------------------------------------------------------------------------

@register(
    "minmax",
    """
    SELECT min(value) AS min_value, max(value) AS max_value,
           least(0.0, min(value)) AS min_value_zeroseed,
           greatest(0.0, max(value)) AS max_value_zeroseed
    FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    """,
)
def q_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one aggregation, both semantics: true min/max AND the reference's
    # zero-seeded accumulators (main.py:131-132 start at 0, so reference
    # answers are min(0, data_min) / max(0, data_max) — SURVEY §2.2 A2
    # quirk, oracle-checked here rather than as a separate query)
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.where(v.isNotNull() & ~F.isnan(v)).agg(
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
        F.least(F.lit(0.0), F.min(v)).alias("min_value_zeroseed"),
        F.greatest(F.lit(0.0), F.max(v)).alias("max_value_zeroseed"),
    )


# ---------------------------------------------------------------------------
# §2 A5-A9: the flagship histogram (linear / log), dense zero-filled output
# ---------------------------------------------------------------------------

_HISTO_LINEAR_CTES = """
src AS (
    SELECT {col} AS value FROM {table}
    WHERE {col} IS NOT NULL AND NOT isnan({col})
),
mm AS (
    SELECT CAST(trunc(min(value) * 100) AS BIGINT) - 10 AS lo,
           CAST(trunc(max(value) * 100) AS BIGINT) + 10 AS hi
    FROM src
),
keys AS (SELECT CAST(trunc(value * 100) AS BIGINT) AS k FROM src),
counts AS (
    SELECT least(k, hi - 1) AS bin, count(*) AS pixel_count
    FROM keys, mm WHERE k >= lo AND k <= hi
    GROUP BY 1
),
spine AS (SELECT unnest(generate_series(mm.lo, mm.hi - 1)) AS bin FROM mm),
histo AS (
    SELECT s.bin, s.bin / 100.0 AS value,
           CAST(coalesce(c.pixel_count, 0) AS BIGINT) AS pixel_count
    FROM spine s LEFT JOIN counts c USING (bin)
)
"""


def _histo_linear_sql(table: str, col: str = "value") -> str:
    return (
        "WITH "
        + _HISTO_LINEAR_CTES.format(table=table, col=col)
        + "SELECT bin, value, pixel_count FROM histo ORDER BY bin"
    )


@register("histogram_linear", _histo_linear_sql("events"))
def q_histogram_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return H.histogram(load(spark, sf_dir, "events"), "value", "linear")


@register(
    "histogram_log",
    """
    WITH src AS (
        SELECT value FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    mm0 AS (SELECT min(value) AS mn, max(value) AS mx FROM src),
    mm AS (
        SELECT CASE WHEN mn <= 0 THEN abs(mn) + 1 ELSE 0 END AS off,
               CAST(trunc(ln(mn + CASE WHEN mn <= 0 THEN abs(mn) + 1 ELSE 0 END) * 1000) AS BIGINT) AS lo,
               CAST(trunc(ln(mx + CASE WHEN mn <= 0 THEN abs(mn) + 1 ELSE 0 END) * 1000) AS BIGINT) AS hi
        FROM mm0
    ),
    keys AS (SELECT CAST(trunc(ln(s.value + mm.off) * 1000) AS BIGINT) AS k FROM src s, mm),
    counts AS (
        SELECT least(k, hi - 1) AS bin, count(*) AS pixel_count
        FROM keys, mm WHERE k >= lo AND k <= hi GROUP BY 1
    ),
    spine AS (SELECT unnest(generate_series(mm.lo, mm.hi - 1)) AS bin FROM mm)
    SELECT s.bin, round(exp(s.bin / 1000.0) - mm.off, 2) AS value,
           CAST(coalesce(c.pixel_count, 0) AS BIGINT) AS pixel_count
    FROM spine s CROSS JOIN mm LEFT JOIN counts c USING (bin)
    ORDER BY s.bin
    """,
)
def q_histogram_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = H.histogram(load(spark, sf_dir, "events"), "value", "log")
    # labels go through exp(); round to the reference's 2-decimal CSV
    # precision (main.py:124 "%1.2f") so JVM-vs-C libm ulp noise cancels.
    return out.withColumn("value", F.round("value", 2))


@register("histogram_incremental", _histo_linear_sql("events"))
def q_histogram_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Delta-maintained histogram (operators/incremental.py): the corpus is
    # processed as two independent deltas whose sparse partial states are
    # merged and labeled — value-identical to the one-shot pipeline, which
    # is exactly what the (shared) full-recompute oracle asserts.
    from compute_histogram_spark.operators import incremental as INC
    from compute_histogram_spark.plans.bin_scheme import BinScheme

    ev = load(spark, sf_dir, "events")
    mn, mx = H.compute_min_max(ev, "value")
    scheme = BinScheme.from_min_max(mn, mx, "linear")
    # r16 optimization round: the two per-delta states are built from ONE
    # scan tagged by delta id (delta_counts_tagged) instead of one
    # filtered scan per delta — value-identical group-wise (each
    # (delta, bin) group counts exactly the rows the old per-delta filter
    # kept; the isin guard reproduces the old "only deltas 0 and 1 run"
    # domain), and the merge is unchanged. Plan: 2 events scans +
    # 2 bin-keyed Exchanges -> 1 scan + 1 (delta, bin) Exchange.
    delta = F.col("event_id") % 2
    states = INC.delta_counts_tagged(
        ev.where(delta.isin(0, 1)), "value", scheme, delta
    )
    return INC.finalize(INC.merge_states(states), scheme)


# ---------------------------------------------------------------------------
# §2.3: decile summary over the histogram (compute_histogram.sql:1-3)
# ---------------------------------------------------------------------------

_DECILES_ORACLE = (
    "WITH "
    + _HISTO_LINEAR_CTES.format(table="events", col="value")
    + """,
tot AS (SELECT CAST(sum(pixel_count) AS BIGINT) AS total FROM histo),
cum AS (
    SELECT value, pixel_count, total,
           CAST(sum(pixel_count) OVER (ORDER BY value) AS BIGINT) AS cum
    FROM histo, tot
)
SELECT CAST(floor((cum * 1.0 / total) * 10) AS BIGINT) * 10 AS percentile,
       min(value) AS min_value, max(value) AS max_value,
       CAST(sum(pixel_count) AS BIGINT) AS bucket_count
FROM cum
GROUP BY floor((cum * 1.0 / total) * 10)
ORDER BY min_value
"""
)


@register("histogram_deciles", _DECILES_ORACLE)
def q_histogram_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    histo = H.histogram(load(spark, sf_dir, "events"), "value", "linear")
    return D.deciles_sql(histo)


# ---------------------------------------------------------------------------
# quantiles / distinct — sketch-friendly summaries (SURVEY §2.4)
# ---------------------------------------------------------------------------


# rotated out r9 (fifth wave, for semantic_dedup / repeated_span_coverage /
# similarity_topk_sq) — driver-green r02-r08; oracle kept verbatim for
# tests/test_rotated_out.py.
# Histogram-inverted equi-depth (deciles.py:equi_depth_histogram_binned)
# — every decision is integer arithmetic on per-bin counts, so the two
# engines agree bit-for-bit. `//` is DuckDB integer division, matching
# Spark's `div`. The raw-exact global-ntile twin lives in pytest
# (tests/test_deciles.py) — it is deliberately NOT registered: its plan
# is a single-partition sort of the whole table.
EQUI_DEPTH_ORACLE = """
    WITH src AS (
        SELECT value AS v FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    b AS (
        SELECT CAST(trunc(v * 100) AS BIGINT) AS bin, count(*) AS n,
               min(v) AS mn, max(v) AS mx
        FROM src GROUP BY 1
    ),
    c AS (
        SELECT bin, n, mn, mx,
               CAST(coalesce(sum(n) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_excl,
               CAST(sum(n) OVER () AS BIGINT) AS total
        FROM b
    ),
    m AS (
        SELECT bin, n, mn, mx,
               CAST((cum_excl * 10) // total AS INT) + 1 AS bucket
        FROM c
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(sum(n) AS BIGINT) AS n_rows,
           min(mn) AS min_value, max(mx) AS max_value
    FROM m GROUP BY bucket ORDER BY bucket
    """


def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.equi_depth_histogram_binned(
        load(spark, sf_dir, "events"), "value"
    )


# rotated out r12 (eighth wave, for the staged r11 twins) — driver-green
# r05-r11; oracle kept verbatim for tests/test_rotated_out.py.
# Space as the separator: the synthetic corpus has no newlines, so
# "paragraphs" degenerate to words — same machinery, maximal
# duplication stress. Oracle partitions by the paragraph text itself;
# Spark partitions by md5(para) — identical keep decisions.
PARAGRAPH_DEDUP_ORACLE = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    p AS (
        SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
        FROM d
    ),
    q AS (SELECT doc_id, pos, toks[pos] AS para FROM p),
    f AS (
        SELECT doc_id, pos, para,
               row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1
                   AS keep
        FROM q
    )
    SELECT doc_id,
           string_agg(CASE WHEN keep THEN para END, ' ' ORDER BY pos) AS text,
           count(*) AS n_paras,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM f GROUP BY doc_id HAVING n_kept > 0 ORDER BY doc_id
    """


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C4-style global first-occurrence paragraph dedup with document
    # reassembly (operators/dedup.py:paragraph_dedup). Replaced the
    # rows-only equi_depth_histogram_approx entry (VERDICT r04 #7): that
    # operator is sketch-valued by nature and stays tolerance-pinned in
    # tests/test_round2.py; this one is value-exact against the oracle.
    from compute_histogram_spark.operators import dedup as DDm

    return DDm.paragraph_dedup(load(spark, sf_dir, "documents"), sep=" ")


# ---------------------------------------------------------------------------
# relational coverage (joins / group aggs / top-k) — SURVEY §2.3 obligations
# generalized to the star schema. Money summed in integer cents for exact
# cross-engine equality (see operators/relational.py).
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
    WITH li AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100) AS BIGINT) AS qc,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
               CAST(round(l_discount * 100) AS BIGINT) AS dc,
               CAST(round(l_tax * 100) AS BIGINT) AS tc
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qc) AS BIGINT) / 100.0 AS sum_qty,
           CAST(sum(pc) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(sum(pc * (100 - dc)) AS BIGINT) / 10000.0 AS sum_disc_price,
           CAST(sum(pc * (100 - dc) * (100 + tc)) AS BIGINT) / 1000000.0 AS sum_charge,
           CAST(sum(qc) AS BIGINT) / count(*) / 100.0 AS avg_qty,
           CAST(sum(pc) AS BIGINT) / count(*) / 100.0 AS avg_price,
           CAST(sum(dc) AS BIGINT) / count(*) / 100.0 AS avg_disc,
           count(*) AS count_order
    FROM li GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.pricing_summary(load(spark, sf_dir, "lineitem"))


# rotated out r11 (seventh wave, for the BPE/simhash/pack/url twins) —
# driver-green r01-r10; oracle kept verbatim for
# tests/test_rotated_out.py and bench.LOCAL_ORACLES (headline member).
# The 3-table TPC-H join family stays driver-covered by pricing_summary,
# local_supplier_revenue, late_order_priority and rollup_revenue.
SHIPPING_PRIORITY_ORACLE = """
    SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.shipping_priority(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
    )


@register(
    "local_supplier_revenue",
    """
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) / 10000.0 AS revenue
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.local_supplier_revenue(
        load(spark, sf_dir, "region"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        region_name="ASIA",
    )


# rotated out r10 (sixth wave, for the PageRank/KMV/CMS/PQ twins) —
# driver-green r01-r09; oracle kept verbatim for
# tests/test_rotated_out.py (blocked-join fuzzy matching stays
# driver-covered by dedup_ngram_jaccard's blocked exact-pairs shape).
FUZZY_NAME_PAIRS_ORACLE = """
    WITH s AS (
        SELECT p_partkey AS id, p_name AS nm,
               substring(p_name, 1, 1) AS blk, length(p_name) AS ln
        FROM part
    )
    SELECT a.id AS id_1, b.id AS id_2, a.nm AS name_1, b.nm AS name_2,
           CAST(levenshtein(a.nm, b.nm) AS INT) AS distance
    FROM s a JOIN s b
      ON a.blk = b.blk AND a.id < b.id AND abs(a.ln - b.ln) <= 2
    WHERE levenshtein(a.nm, b.nm) <= 2
    ORDER BY id_1, id_2
    """


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.fuzzy_name_pairs(load(spark, sf_dir, "part"))


# rotated out r9 (fifth wave) — driver-green since r02; oracle kept for
# tests/test_rotated_out.py (grouping-sets family stays driver-covered by
# rollup_revenue).
GROUPING_SETS_ORACLE = """
    SELECT coalesce(CAST(order_year AS VARCHAR), 'ALL') AS order_year,
           coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS revenue,
           count(*) AS n_orders
    FROM (SELECT year(o_orderdate) AS order_year, o_orderpriority, o_totalprice
          FROM orders)
    GROUP BY GROUPING SETS ((order_year, o_orderpriority), (o_orderpriority), ())
    ORDER BY order_year, o_orderpriority
    """


def q_priority_year_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.priority_year_grouping_sets(load(spark, sf_dir, "orders"))


@register(
    "late_order_priority",
    # rotated IN late r6 (was a bench-only r01 entry): TPC-H Q4 shape —
    # EXISTS over lineitem rewritten as aggregate-then-join on the Spark
    # side; DuckDB runs the EXISTS form natively. SQL verbatim from
    # bench.LOCAL_ORACLES (kept there as a fallback for future rotations).
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.late_order_priority(
        load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    )


@register(
    "rollup_revenue",
    # rotated IN late r6 (was a bench-only r01 entry): 3-level ROLLUP in a
    # single Exchange; cents-exact sums make every level hash-identical.
    """
    SELECT coalesce(r.r_name, 'ALL') AS r_name,
           coalesce(n.n_name, 'ALL') AS n_name,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY r_name, n_name
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.rollup_revenue(
        load(spark, sf_dir, "region"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
    )


# rotated out r10 (sixth wave) — driver-green r01-r09; oracle kept
# verbatim for tests/test_rotated_out.py (the broadcast-dim + conditional
# aggregation family stays driver-covered by rollup_revenue and
# local_supplier_revenue). TPC-H Q14 shape; promo_pct divides two exact
# integer cents*1e2 sums, so the double is bit-identical cross-engine.
PROMO_REVENUE_SHARE_ORACLE = """
    WITH li AS (
        SELECT l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS disc_pc
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
    )
    SELECT sum(CASE WHEN p.p_type = 'PROMO' THEN li.disc_pc ELSE 0 END)
               * 100.0 / sum(li.disc_pc) AS promo_pct,
           sum(li.disc_pc) / 10000.0 AS total_revenue
    FROM li JOIN part p ON li.l_partkey = p.p_partkey
    """


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.promo_revenue_share(
        load(spark, sf_dir, "part"), load(spark, sf_dir, "lineitem")
    )


# ---------------------------------------------------------------------------
# window-function coverage beyond the decile cumsum: ntile bucketing and
# running totals with explicit frames (ROWS UNBOUNDED PRECEDING)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# grouping sets / pivot / date parts / set ops / anti join (operators/
# relational.py extensions)
# ---------------------------------------------------------------------------


# orders_pivot rotated out in r6 — oracle in tests/test_rotated_out.py.


# rotated out late r6 (second wave) — driver-green r01-r05+, oracle kept
# verbatim below for tests/test_rotated_out.py
JSON_PROPS_ORACLE = """
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(json_extract(props, '$.k')) AS BIGINT) AS n_k
    FROM events GROUP BY event_type ORDER BY event_type
    """


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # JSON path extraction in the scan projection — the function class behind
    # the reference's GeoJSON catalog read (S1, main.py:60-74), here applied
    # per-row. get_json_object is JVM-side (Jackson), no Python boundary.
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("k").alias("n_k"))
        .orderBy("event_type")
    )


# set_ops_users rotated out in r6 — oracle in tests/test_rotated_out.py.


# ---------------------------------------------------------------------------
# temporal joins (operators/temporal.py): as-of join + range band join
# ---------------------------------------------------------------------------

from compute_histogram_spark.operators import temporal as T  # noqa: E402


# rotated out r15 (eleventh wave, for the staged streaming/TPC-H twins)
# — driver-green r02-r14 (13 rounds); oracle kept verbatim for
# tests/test_rotated_out.py.
ASOF_JOIN_ORACLE = """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events),
    o AS (
        SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS odu, o_totalprice
        FROM orders
    ),
    j AS (
        -- LEFT join: the operator keeps events with no prior order (NULL
        -- payload); the fixtures happen to have none, but the semantics
        -- must match regardless of data.
        SELECT e.event_id, e.user_id, o.o_orderkey, o.odu, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.odu DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM e LEFT JOIN o ON o.o_custkey = e.user_id AND o.odu <= e.tsu
    )
    SELECT event_id, user_id,
           o_orderkey AS asof_orderkey,
           odu AS asof_order_us,
           o_totalprice AS asof_totalprice
    FROM j WHERE rn = 1 ORDER BY event_id
    """


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark plan is union+carry-forward (ONE shuffle, no range fan-out); the
    # oracle is the O(pairs) range-join argmax — same semantics, different
    # physical strategy, which is the point.
    return T.asof_enrich_events(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "orders")
    )


# rotated out r15 (eleventh wave) — driver-green r02-r14; oracle kept
# verbatim for tests/test_rotated_out.py.
RANGE_BAND_JOIN_ORACLE = f"""
    WITH bands(band, lo, hi) AS (
        VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in T.VALUE_BANDS)}
    )
    SELECT band, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY band, b.lo ORDER BY b.lo
    """


def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.events_by_band(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# approximate sketches (SURVEY §2.4) — rows-only driver check by design:
# HLL++/KLL estimates are engine-specific, so no value-exact oracle exists.
# tests/test_deciles.py pins them against exact answers with tolerance.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# time windows + sessionization (batch twins of the streaming operators).
# ts is epoch-nanos BIGINT in Spark; both engines agree at micros precision.
# ---------------------------------------------------------------------------

# rotated out r15 (eleventh wave) — driver-green r02-r14; oracle kept
# verbatim for tests/test_rotated_out.py.
WINDOWED_HISTOGRAM_ORACLE = """
    SELECT (epoch_us(ts) // 600000000) * 600 AS window_start_s,
           CAST(floor(value / 50.0) AS BIGINT) AS bin,
           CAST(floor(value / 50.0) AS BIGINT) * 50.0 AS bin_value,
           count(*) AS n_events
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY 1, 2, 3 ORDER BY 1, 2
    """


def q_windowed_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.windowed_histogram(load(spark, sf_dir, "events"))


# rotated out r14 (tenth wave, for the staged r13 twins) — driver-green
# r02-r13 (11 rounds); oracle kept verbatim for tests/test_rotated_out.py.
CLICK_ATTRIBUTION_ORACLE = """
    WITH a AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
        FROM events WHERE event_type = 'click'
    ),
    b AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id, a.click_id, b.purchase_id,
           (b.purchase_us - a.click_us) / 1000000.0 AS delay_s
    FROM a JOIN b ON b.user_id = a.user_id
                 AND b.purchase_us > a.click_us
                 AND b.purchase_us <= a.click_us + 1800000000
    ORDER BY a.user_id, a.click_id, b.purchase_id
    """


def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.click_attribution(load(spark, sf_dir, "events"))


# rotated out r15 (eleventh wave) — driver-green r02-r14; oracle kept
# verbatim for tests/test_rotated_out.py (the salted variant's shared
# oracle at q_sessionize_salted stays pointing here).
SESSIONIZE_ORACLE = """
    WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
    l AS (
        SELECT *, lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
        FROM t
    ),
    f AS (
        SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS is_new
        FROM l
    ),
    s AS (
        SELECT *, CAST(sum(is_new) OVER (
            PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING
        ) AS BIGINT) AS session_id
        FROM f
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(tsu) AS start_us, max(tsu) AS end_us,
           (max(tsu) - min(tsu)) / 1000000 AS duration_s
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sessionize(load(spark, sf_dir, "events"))


# rotated IN late r6 (third wave); rotated out r12 (eighth wave) —
# driver-green r06-r11; oracle kept verbatim for
# tests/test_rotated_out.py. The sweep-line load curve over the
# sessionized events — all-integer output (change-point micros +
# running active-session count), so the oracle is hash-exact. The
# Spark side computes the running sum per time BUCKET with a bounded
# bucket-prefix stitch (behavior.py docstring: no global sort);
# DuckDB's single-node global window is the oracle shape.
SESSION_CONCURRENCY_ORACLE = """
    WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
    l AS (
        SELECT *, lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
        FROM t
    ),
    f AS (
        SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS is_new
        FROM l
    ),
    s AS (
        SELECT *, CAST(sum(is_new) OVER (
            PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING
        ) AS BIGINT) AS session_id
        FROM f
    ),
    sess AS (
        SELECT user_id, session_id, min(tsu) AS start_us, max(tsu) AS end_us
        FROM s GROUP BY user_id, session_id
    ),
    d AS (
        SELECT start_us AS ts_us, 1 AS d FROM sess
        UNION ALL SELECT end_us + 1, -1 FROM sess
    ),
    g AS (SELECT ts_us, sum(d) AS d FROM d GROUP BY ts_us)
    SELECT ts_us, CAST(sum(d) OVER (ORDER BY ts_us) AS BIGINT) AS n_active
    FROM g ORDER BY ts_us
    """


def q_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import behavior as BH

    return BH.session_concurrency(W.sessionize(load(spark, sf_dir, "events")))


# ---------------------------------------------------------------------------
# dedup suite (operators/dedup.py) — documents table. Oracle SQL mirrors the
# md5-based signatures exactly; shingling is word 3-grams on single-space
# tokens in both engines.
# ---------------------------------------------------------------------------

from compute_histogram_spark.operators import dedup as DD  # noqa: E402

_SHINGLE_CTES = """
toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
    SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS g
    FROM toks
),
sh AS (
    SELECT DISTINCT doc_id, concat_ws(' ', toks[g], toks[g+1], toks[g+2]) AS s
    FROM g
)
"""


# rotated out late r6 (third wave, for session_concurrency) — driver-green
# r01-r06; oracle kept verbatim for tests/test_rotated_out.py. The
# streaming twin's diff in tests/test_streaming.py still uses this fn.
USER_STATS_ORACLE = """
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY user_id ORDER BY user_id
    """


def q_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # batch twin of streaming/stream_ops.py:streaming_user_stats (same
    # cents-exact accumulation); the streaming form is diffed against this
    # result in tests/test_streaming.py — registering the batch side gives
    # the pair a value-exact oracle too.
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return (
        ev.where(v.isNotNull() & ~F.isnan(v))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(R.cents("value")) / 100.0).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("user_id")
    )


# rotated out r16 (twelfth wave, for the staged sketch/graph/ANN/text
# twins) — driver-green r01-r15 (15 rounds, the window's oldest row);
# oracle kept verbatim for tests/test_rotated_out.py and the bench
# LOCAL fallback.
DEDUP_EXACT_ORACLE = """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text ORDER BY doc_id
    """


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark groups by sha2(text) — digest shuffle keys, not full documents;
    # the oracle groups by raw text (same partition, collision-free).
    return DD.exact_dedup(load(spark, sf_dir, "documents"))


def _minhash_bands_ctes(num_hashes: int = 8, rows_per_band: int = 2) -> str:
    """CTE chain ending in ``bands(doc_id, band_id, band_hash)`` — the
    LSH-index substrate shared by the pair oracles and the streaming
    online-dedup twin (which never forms pairs at all)."""
    mins = ",\n           ".join(
        f"min(md5('{i}:' || s)) AS mh{i}" for i in range(num_hashes)
    )
    n_bands = num_hashes // rows_per_band
    band_selects = []
    for b in range(n_bands):
        members = " || '|' || ".join(
            f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({members}) AS band_hash FROM mh"
        )
    bands = "\n    UNION ALL ".join(band_selects)
    return f"""{_SHINGLE_CTES},
    mh AS (
        SELECT doc_id,
           {mins}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
    {bands}
    )"""


def _minhash_pairs_ctes(num_hashes: int = 8, rows_per_band: int = 2) -> str:
    """CTE chain ending in ``pairs(doc_id_1, doc_id_2)`` — shared by the
    pair-emitting oracle and the recursive component-resolution oracle."""
    return f"""{_minhash_bands_ctes(num_hashes, rows_per_band)},
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                    AND a.doc_id < b.doc_id
    )"""


def _minhash_oracle(num_hashes: int = 8, rows_per_band: int = 2) -> str:
    return f"""
    WITH {_minhash_pairs_ctes(num_hashes, rows_per_band)}
    SELECT doc_id_1, doc_id_2 FROM pairs
    ORDER BY doc_id_1, doc_id_2
    """


@register("dedup_minhash", _minhash_oracle())
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.minhash_candidates(load(spark, sf_dir, "documents"))


# rotated out r14 (tenth wave) — driver-green r01-r13 (13 rounds);
# oracle kept verbatim for tests/test_rotated_out.py.
DEDUP_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    e AS (
        SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
        UNION SELECT doc_id_2, doc_id_1 FROM pairs
    ),
    reach(node, r) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node
    )
    SELECT node, min(r) AS component FROM reach
    GROUP BY node ORDER BY node
    """


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pair -> cluster resolution (operators/graph.py): min-label propagation
    # to fixpoint over the minhash candidate graph. The oracle computes the
    # same min-reachable-label fixpoint with a recursive CTE — a value-exact
    # cross-engine check for a genuinely iterative operator.
    from compute_histogram_spark.operators import graph as G

    pairs = DD.minhash_candidates(load(spark, sf_dir, "documents"))
    return G.connected_components(pairs)


_NGRAM_MAX_DF = 100  # hub-shingle cap: df > this = boilerplate, dropped


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLE_CTES},
    hub AS (SELECT s FROM sh GROUP BY s HAVING count(*) > {_NGRAM_MAX_DF}),
    shc AS (SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hub)),
    sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, count(*) AS i
        FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_id_1, doc_id_2,
           round((i * 1.0) / (s1.n + s2.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc_id_1
    JOIN sizes s2 ON s2.doc_id = doc_id_2
    WHERE round((i * 1.0) / (s1.n + s2.n - i), 6) >= 0.5
    ORDER BY doc_id_1, doc_id_2
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_df SET (VERDICT r01 #2): shingles in > max_df documents are hub/
    # boilerplate — they contribute candidate pairs quadratically in df but
    # ~zero Jaccard signal, and the cap is the lever that keeps the exact
    # inverted-index method viable at scale (operators/dedup.py:126). At
    # 100 docs (20% of the sf0.01 corpus; scale-invariant in spirit: any
    # shingle that common is boilerplate at every sf) the pair space stays
    # bounded by rare-shingle co-occurrence. Capping semantics are
    # oracle-matched; behavior pinned in tests/test_round2.py.
    return DD.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.5, max_df=_NGRAM_MAX_DF
    )


def _simhash_oracle(bits: int = 16) -> str:
    sums = ",\n           ".join(
        f"sum(c * (2 * ((instr('0123456789abcdef', substr(h, {i}, 1)) - 1) % 2) - 1)) AS s{i}"
        for i in range(1, bits + 1)
    )
    bits_expr = " + ".join(
        f"(CASE WHEN s{i} >= 0 THEN {2 ** (i - 1)} ELSE 0 END)"
        for i in range(1, bits + 1)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    c AS (
        SELECT doc_id, t, count(*) AS c, md5(t) AS h
        FROM tok GROUP BY doc_id, t
    ),
    s AS (
        SELECT doc_id,
           {sums}
        FROM c GROUP BY doc_id
    )
    SELECT doc_id, CAST({bits_expr} AS BIGINT) AS simhash
    FROM s ORDER BY doc_id
    """


# rotated out late r6 (second wave) — _simhash_oracle stays exported for
# tests/test_rotated_out.py
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash(load(spark, sf_dir, "documents"))


# rotated out r10 (sixth wave) — driver-green r01-r09; oracle kept
# verbatim for tests/test_rotated_out.py (the embedding-cosine family
# stays driver-covered by similarity_topk / semantic_dedup and gains
# similarity_topk_pq this round).
DEDUP_EMBEDDING_ORACLE = """
    WITH u AS (
        SELECT vec_id, label, g, CAST(embedding[g] AS DOUBLE) AS x
        FROM (
            SELECT vec_id, label, embedding,
                   unnest(generate_series(1, len(embedding))) AS g
            FROM embeddings
        )
    ),
    n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM u GROUP BY vec_id),
    d AS (
        SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2, sum(a.x * b.x) AS dot
        FROM u a
        JOIN u b ON a.g = b.g AND a.label = b.label AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    ),
    c AS (
        SELECT vec_id_1, vec_id_2,
               round(dot / (n1.nrm * n2.nrm), 6) AS cosine
        FROM d
        JOIN n n1 ON n1.vec_id = vec_id_1
        JOIN n n2 ON n2.vec_id = vec_id_2
    )
    SELECT vec_id_1, vec_id_2, cosine FROM c
    WHERE cosine >= 0.35 ORDER BY vec_id_1, vec_id_2
    """


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.embedding_neardup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.35)


@register(
    "semantic_dedup",
    # SemDeDup (dedup.py:semantic_dedup, arXiv:2303.09540) driver-exposed
    # r9 (5th rotation — the one named LLM-pipeline op never under the
    # gate, VERDICT r08 #3). Deterministic configuration for the oracle:
    # centroids = the k-means SEED (10 lowest vec_ids, coords rounded to 6
    # decimals — exactly clustering.kmeans(iters=0)), keep="min_id". The
    # full Lloyd's-trained path + "closest" policy stay pinned by the
    # NumPy-twin equality test (tests/test_dedup.py). Assignment twin:
    # d = |x|^2 - 2x.c + |c|^2 rounded to 6 decimals, argmin ties to the
    # lowest cid (clustering.assign_udf); pair twin: within-cluster cosine
    # rounded to 6 >= 0.35 (same rounding both engines; measured value gap
    # around the threshold is ~9e-4 at sf0.01 — see BASELINE.md r9);
    # component resolution: min-reachable-label fixpoint as a recursive
    # CTE (pattern: dedup_clusters).
    """
    WITH RECURSIVE
    u AS (
        SELECT vec_id, g, CAST(embedding[g] AS DOUBLE) AS x
        FROM (
            SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS g
            FROM embeddings
        )
    ),
    seed AS (SELECT DISTINCT vec_id FROM u ORDER BY vec_id LIMIT 10),
    cent AS (
        SELECT dense_rank() OVER (ORDER BY u.vec_id) - 1 AS cid, g,
               round(x, 6) AS c
        FROM u JOIN seed ON seed.vec_id = u.vec_id
    ),
    csq AS (SELECT cid, sum(c * c) AS c2 FROM cent GROUP BY cid),
    vsq AS (
        SELECT vec_id, sum(x * x) AS v2, sqrt(sum(x * x)) AS nrm
        FROM u GROUP BY vec_id
    ),
    xc AS (
        SELECT u.vec_id, cent.cid, sum(u.x * cent.c) AS dot
        FROM u JOIN cent ON cent.g = u.g GROUP BY 1, 2
    ),
    dist AS (
        SELECT xc.vec_id, xc.cid, round(v2 - 2 * dot + c2, 6) AS d2
        FROM xc JOIN vsq USING (vec_id) JOIN csq USING (cid)
    ),
    asg AS (
        SELECT vec_id, CAST(cid AS INT) AS cid FROM (
            SELECT vec_id, cid, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, cid
            ) AS rk
            FROM dist
        ) WHERE rk = 1
    ),
    pd AS (
        SELECT a.vec_id AS v1, b.vec_id AS v2x, sum(ua.x * ub.x) AS dot
        FROM asg a
        JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
        JOIN u ua ON ua.vec_id = a.vec_id
        JOIN u ub ON ub.vec_id = b.vec_id AND ub.g = ua.g
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT v1, v2x FROM pd
        JOIN vsq n1 ON n1.vec_id = v1
        JOIN vsq n2 ON n2.vec_id = v2x
        WHERE round(dot / (n1.nrm * n2.nrm), 6) >= 0.35
    ),
    e AS (
        SELECT v1 AS a, v2x AS b FROM pairs
        UNION SELECT v2x, v1 FROM pairs
    ),
    reach(node, r) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    keepers AS (
        SELECT component, min(node) AS keep_id FROM comp GROUP BY component
    )
    SELECT asg.vec_id, asg.cid,
           coalesce(comp.node = k.keep_id, TRUE) AS kept
    FROM asg
    LEFT JOIN comp ON comp.node = asg.vec_id
    LEFT JOIN keepers k ON k.component = comp.component
    ORDER BY asg.vec_id
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators.clustering import kmeans

    emb = load(spark, sf_dir, "embeddings")
    cents = kmeans(emb, n_clusters=10, iters=0)  # deterministic seed
    return DD.semantic_dedup(
        emb, threshold=0.35, centroids=cents, keep="min_id"
    )


@register(
    "repeated_span_coverage",
    # Cross-document boilerplate coverage (dedup.py:repeated_span_coverage)
    # driver-exposed r9 (5th rotation); the oracle is the DuckDB twin that
    # lived in tests/test_dedup.py since r6, lifted verbatim — interval
    # sweep semantics: span i covers min(n, next_start - start) tokens.
    """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    g AS (
        SELECT doc_id, n_tokens,
               unnest(generate_series(1, n_tokens - 4)) AS pos, toks
        FROM t WHERE n_tokens >= 5
    ),
    grams AS (
        SELECT doc_id, n_tokens, pos,
               toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] || ' '
                   || toks[pos+3] || ' ' || toks[pos+4] AS gram
        FROM g
    ),
    hot AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2
    ),
    spans AS (SELECT doc_id, n_tokens, pos FROM grams JOIN hot USING (gram)),
    swept AS (
        SELECT doc_id, n_tokens,
               least(5, coalesce(
                   lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos, 5
               )) AS cov
        FROM spans
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_hot_spans,
               CAST(sum(cov) AS BIGINT) AS covered_tokens
        FROM swept GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens,
           coalesce(n_hot_spans, 0) AS n_hot_spans,
           coalesce(covered_tokens, 0) AS covered_tokens,
           round(coalesce(covered_tokens, 0) * 1.0 / t.n_tokens, 6)
               AS dup_frac
    FROM t LEFT JOIN per_doc USING (doc_id)
    WHERE t.n_tokens >= 5
    ORDER BY t.doc_id
    """,
)
def q_repeated_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.repeated_span_coverage(
        load(spark, sf_dir, "documents"), n=5, min_df=2
    )


# ---------------------------------------------------------------------------
# similarity search (operators/similarity.py) — embeddings table
# ---------------------------------------------------------------------------

from compute_histogram_spark.operators import similarity as SIM  # noqa: E402

_EMB_CTES = """
u AS (
    SELECT vec_id, label, g, CAST(embedding[g] AS DOUBLE) AS x
    FROM (
        SELECT vec_id, label, embedding,
               unnest(generate_series(1, len(embedding))) AS g
        FROM embeddings
    )
),
n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM u GROUP BY vec_id)
"""


# rotated out r16 (twelfth wave) — driver-green r01-r15; oracle kept
# verbatim for tests/test_rotated_out.py, the bench LOCAL fallback, and
# the GEMM / PCA-index tiers that share it (value-identical results).
SIMILARITY_TOPK_ORACLE = f"""
    WITH {_EMB_CTES},
    d AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id, sum(q.x * c.x) AS dot
        FROM u q JOIN u c ON q.g = c.g AND q.vec_id != c.vec_id
        WHERE q.vec_id < 10
        GROUP BY 1, 2
    ),
    cs AS (
        SELECT query_id, d.vec_id AS vec_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cosine
        FROM d
        JOIN n nq ON nq.vec_id = d.query_id
        JOIN n nc ON nc.vec_id = d.vec_id
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id
        ) AS rnk
        FROM cs
    )
    SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 5
    ORDER BY query_id, rnk
    """


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.cosine_topk(load(spark, sf_dir, "embeddings"))


# rotated out r9 (fifth wave) — driver-green r01-r08; oracle kept for
# tests/test_rotated_out.py (similarity family stays driver-covered by
# similarity_topk, similarity_topk_lsh and the new similarity_topk_sq).
SIMILARITY_IVF_ORACLE = f"""
    WITH {_EMB_CTES},
    d AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id, sum(q.x * c.x) AS dot
        FROM u q JOIN u c ON q.g = c.g AND q.label = c.label
                         AND q.vec_id != c.vec_id
        WHERE q.vec_id < 10
        GROUP BY 1, 2
    ),
    cs AS (
        SELECT query_id, d.vec_id AS vec_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cosine
        FROM d
        JOIN n nq ON nq.vec_id = d.query_id
        JOIN n nc ON nc.vec_id = d.vec_id
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id
        ) AS rnk
        FROM cs
    )
    SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 5
    ORDER BY query_id, rnk
    """


def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.cosine_topk_ivf(load(spark, sf_dir, "embeddings"))


# rotated out r11 (seventh wave) — driver-green r09-r10; oracle kept
# verbatim for tests/test_rotated_out.py. The ANN compression ladder stays
# driver-covered by similarity_topk, similarity_topk_lsh and
# similarity_topk_pq (PQ subsumes SQ's quantize-shortlist-rerank shape).
SIMILARITY_SQ_ORACLE = (
    # int8 scalar-quantization ANN (operators/pq.py:cosine_topk_sq): the
    # middle rung of the compression ladder, driver-exposed r9 (5th
    # rotation). Every quantization decision is replicated arithmetic:
    # per-vector scale = max|x|/127 floored at 1e-30, q_i = round(x/scale)
    # (both engines round half away from zero), integer dot, approx cosine
    # rounded to 6 decimals BEFORE the shortlist rank — so shortlist order
    # (ties broken by vec_id) is cross-engine deterministic; exact rerank
    # mirrors similarity_topk.
    """
    WITH u AS (
        SELECT vec_id, g, CAST(embedding[g] AS DOUBLE) AS x
        FROM (
            SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS g
            FROM embeddings
        )
    ),
    n AS (
        SELECT vec_id, sqrt(sum(x * x)) AS nrm,
               greatest(max(abs(x)) / 127.0, 1e-30) AS scale
        FROM u GROUP BY vec_id
    ),
    q AS (
        SELECT u.vec_id, g, CAST(round(x / n.scale) AS INT) AS qv
        FROM u JOIN n ON n.vec_id = u.vec_id
    ),
    idot AS (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               CAST(sum(a.qv * b.qv) AS DOUBLE) AS dot
        FROM q a JOIN q b ON a.g = b.g AND a.vec_id != b.vec_id
        WHERE a.vec_id < 10
        GROUP BY 1, 2
    ),
    approx AS (
        SELECT query_id, idot.vec_id,
               round(dot * nq.scale * nc.scale / (nq.nrm * nc.nrm), 6)
                   AS approx
        FROM idot
        JOIN n nq ON nq.vec_id = idot.query_id
        JOIN n nc ON nc.vec_id = idot.vec_id
    ),
    short AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id, row_number() OVER (
                PARTITION BY query_id ORDER BY approx DESC, vec_id
            ) AS srk
            FROM approx
        ) WHERE srk <= 50
    ),
    d AS (
        SELECT s.query_id, s.vec_id, sum(qa.x * ca.x) AS dot
        FROM short s
        JOIN u qa ON qa.vec_id = s.query_id
        JOIN u ca ON ca.vec_id = s.vec_id AND ca.g = qa.g
        GROUP BY 1, 2
    ),
    cs AS (
        SELECT query_id, d.vec_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cosine
        FROM d
        JOIN n nq ON nq.vec_id = d.query_id
        JOIN n nc ON nc.vec_id = d.vec_id
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id
        ) AS rnk
        FROM cs
    )
    SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 5
    ORDER BY query_id, rnk
    """
)


def q_similarity_topk_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import pq as PQ

    return PQ.cosine_topk_sq(load(spark, sf_dir, "embeddings"))


# ROTATED IN r10 (sixth wave): full arithmetic DuckDB
# twin for PQ ANN under the deterministic SEED-codebook configuration
# (pq_train iters=0: codebooks = the first ksub vectors' subspace slices
# rounded to 6 decimals — the same iters=0 twin pattern as
# semantic_dedup's seed centroids). Code assignment replicates the
# expansion-form distance rounded to 6 with lowest-j ties; ADC approx and
# exact-rerank cosines round to 6 before ranking. Value-exact at sf0.001
# AND sf0.01 (tests/test_pq.py pins it until it enters the window).
SIMILARITY_PQ_ORACLE = """
    WITH u AS (
        SELECT vec_id, g, CAST(embedding[g] AS DOUBLE) AS x
        FROM (
            SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS g
            FROM embeddings
        )
    ),
    n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM u GROUP BY vec_id),
    us AS (
        SELECT vec_id, (g - 1) // 8 AS s, (g - 1) % 8 AS d, x FROM u
    ),
    seed AS (SELECT DISTINCT vec_id FROM u ORDER BY vec_id LIMIT 16),
    book AS (
        SELECT us.s,
               dense_rank() OVER (PARTITION BY us.s ORDER BY us.vec_id) - 1
                   AS j,
               us.d, round(us.x, 6) AS b
        FROM us JOIN seed ON seed.vec_id = us.vec_id
    ),
    v2s AS (SELECT vec_id, s, sum(x * x) AS v2 FROM us GROUP BY 1, 2),
    b2s AS (SELECT s, j, sum(b * b) AS b2 FROM book GROUP BY 1, 2),
    xb AS (
        SELECT us.vec_id, us.s, book.j, sum(us.x * book.b) AS dot
        FROM us JOIN book ON book.s = us.s AND book.d = us.d
        GROUP BY 1, 2, 3
    ),
    dist AS (
        SELECT xb.vec_id, xb.s, xb.j, round(v2 - 2 * dot + b2, 6) AS d2
        FROM xb
        JOIN v2s ON v2s.vec_id = xb.vec_id AND v2s.s = xb.s
        JOIN b2s ON b2s.s = xb.s AND b2s.j = xb.j
    ),
    code AS (
        SELECT vec_id, s, j FROM (
            SELECT vec_id, s, j, row_number() OVER (
                PARTITION BY vec_id, s ORDER BY d2, j
            ) AS rk
            FROM dist
        ) WHERE rk = 1
    ),
    usq AS (SELECT vec_id, s, d, x FROM us WHERE vec_id < 10),
    adc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               sum(q.x * book.b) AS adot
        FROM code c
        JOIN book ON book.s = c.s AND book.j = c.j
        JOIN usq q ON q.s = book.s AND q.d = book.d
        WHERE q.vec_id != c.vec_id
        GROUP BY 1, 2
    ),
    approx AS (
        SELECT query_id, adc.vec_id,
               round(adot / (nq.nrm * nc.nrm), 6) AS approx
        FROM adc
        JOIN n nq ON nq.vec_id = adc.query_id
        JOIN n nc ON nc.vec_id = adc.vec_id
    ),
    short AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id, row_number() OVER (
                PARTITION BY query_id ORDER BY approx DESC, vec_id
            ) AS srk
            FROM approx
        ) WHERE srk <= 50
    ),
    d AS (
        SELECT s.query_id, s.vec_id, sum(qa.x * ca.x) AS dot
        FROM short s
        JOIN u qa ON qa.vec_id = s.query_id
        JOIN u ca ON ca.vec_id = s.vec_id AND ca.g = qa.g
        GROUP BY 1, 2
    ),
    cs AS (
        SELECT query_id, d.vec_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cosine
        FROM d
        JOIN n nq ON nq.vec_id = d.query_id
        JOIN n nc ON nc.vec_id = d.vec_id
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id
        ) AS rnk
        FROM cs
    )
    SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 5
    ORDER BY query_id, rnk
    """


@register("similarity_topk_pq", SIMILARITY_PQ_ORACLE)
def q_similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import pq as PQ

    # iters=0: seed codebooks, the oracle-deterministic configuration;
    # Lloyd's-trained codebooks stay pinned by the NumPy twin + recall
    # floor in tests/test_pq.py
    return PQ.cosine_topk_pq(load(spark, sf_dir, "embeddings"), iters=0)


# rotated out r7 (fourth wave, for the r6 LM/mix/concurrency/neardup ops) —
# driver-green r02-r06; shares similarity_topk's oracle (value-identical by
# construction), re-checked in tests/test_rotated_out.py.
SIMILARITY_GEMM_ORACLE = SIMILARITY_TOPK_ORACLE


def q_similarity_topk_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same semantics as similarity_topk (shared oracle); the physical
    # strategy is the Arrow-batched blocked-GEMM Pandas kernel — the
    # high-dim escape hatch, value-identical on 6-decimal-rounded cosine.
    return SIM.cosine_topk_gemm(load(spark, sf_dir, "embeddings"))


def _lsh_oracle(dim: int = 64, n_planes: int = 4, n_tables: int = 8) -> str:
    # identical ±1 plane constants on both sides (md5-derived, no RNG);
    # integer-quantized dots make the sign — hence the bucket — exact.
    vals = ", ".join(
        f"({t}, {j}, {g + 1}, {SIM.hyperplanes(dim, n_planes, t)[j][g]})"
        for t in range(n_tables)
        for j in range(n_planes)
        for g in range(dim)
    )
    return f"""
    WITH {_EMB_CTES},
    planes(t, j, g, c) AS (VALUES {vals}),
    qx AS (SELECT vec_id, g, CAST(round(x * {SIM.QUANT}) AS BIGINT) AS qx FROM u),
    sj AS (
        SELECT qx.vec_id, p.t, p.j, sum(qx.qx * p.c) AS s
        FROM qx JOIN planes p ON p.g = qx.g GROUP BY 1, 2, 3
    ),
    b AS (
        SELECT vec_id, t,
               CAST(sum(CASE WHEN s >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT)
                   AS bucket
        FROM sj GROUP BY vec_id, t
    ),
    cand AS (
        SELECT DISTINCT bq.vec_id AS query_id, bc.vec_id AS vec_id
        FROM b bq
        JOIN b bc ON bc.t = bq.t AND bc.bucket = bq.bucket
                 AND bc.vec_id != bq.vec_id
        WHERE bq.vec_id < 10
    ),
    d AS (
        SELECT cand.query_id, cand.vec_id, sum(q.x * c.x) AS dot
        FROM cand
        JOIN u q ON q.vec_id = cand.query_id
        JOIN u c ON c.vec_id = cand.vec_id AND c.g = q.g
        GROUP BY 1, 2
    ),
    cs AS (
        SELECT query_id, d.vec_id AS vec_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cosine
        FROM d
        JOIN n nq ON nq.vec_id = d.query_id
        JOIN n nc ON nc.vec_id = d.vec_id
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id
        ) AS rnk
        FROM cs
    )
    SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 5
    ORDER BY query_id, rnk
    """


# split_counts / lang_capped_sample / doc_chunks / contamination_report /
# pii_scrub / corpus_checksum / corpus_mix_counts rotated out of the driver
# window in r6 (VERDICT r05 #1) — full DuckDB-twin oracles live in
# tests/test_rotated_out.py.


# rotated out r7 (fourth wave) — driver-green r01-r06; oracle kept verbatim
# for tests/test_rotated_out.py.
EVENT_TRANSITIONS_ORACLE = """
    WITH t AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS to_type
        FROM events
    )
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM t WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type ORDER BY from_type, to_type
    """


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import behavior as BH

    return BH.event_transitions(load(spark, sf_dir, "events"))


_PROFILE_COLS = ("event_id", "event_type", "props", "user_id", "value")
# ts is profiled Spark-side only: its nanos->micros truncation in DuckDB
# can merge distinct values, so cross-engine distinct counts would lie.


def _null_profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        nan = (
            "count(CASE WHEN isnan(value) THEN 1 END)"
            if c == "value"
            else "CAST(0 AS BIGINT)"
        )
        parts.append(
            f"SELECT '{c}' AS \"column\", count(*) AS n_rows, "
            f"count(CASE WHEN {c} IS NULL THEN 1 END) AS n_null, "
            f"{nan} AS n_nan, count(DISTINCT {c}) AS n_distinct FROM events"
        )
    return "\nUNION ALL ".join(parts) + '\nORDER BY "column"'


# rotated out late r6 (second wave) — _null_profile_oracle stays exported
# for tests/test_rotated_out.py
def q_events_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import profile as PR

    return PR.null_profile(load(spark, sf_dir, "events"), list(_PROFILE_COLS))


# rotated out late r6 (second wave) — oracle kept for the rotated-out tests
HISTOGRAM_2D_ORACLE = """
    SELECT CAST(epoch_us(ts) // 3600000000 % 24 AS INT) AS hour,
           CAST(floor(value / 50.0) AS BIGINT) AS bin,
           floor(value / 50.0) * 50.0 AS bin_value,
           count(*) AS n_events
    FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY 1, 2, 3 ORDER BY hour, bin
    """


def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import profile as PR

    return PR.histogram_2d(load(spark, sf_dir, "events"))


# rotated out r15 (eleventh wave) — driver-green r02-r14; oracle kept
# verbatim for tests/test_rotated_out.py.
CONVERSION_FUNNEL_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
               min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t1,
               min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t2
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT
            count(CASE WHEN t0 IS NOT NULL THEN 1 END) AS n0,
            count(CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN 1 END) AS n1,
            count(CASE WHEN t0 IS NOT NULL AND t1 > t0 AND t2 > t1 THEN 1 END) AS n2
        FROM per_user
    )
    SELECT CAST(0 AS INT) AS stage_idx, 'view' AS stage, n0 AS n_users,
           CAST(n0 AS DOUBLE) / n0 AS conversion FROM c
    UNION ALL SELECT 1, 'click', n1, CAST(n1 AS DOUBLE) / n0 FROM c
    UNION ALL SELECT 2, 'purchase', n2, CAST(n2 AS DOUBLE) / n0 FROM c
    ORDER BY stage_idx
    """


def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import behavior as BH

    return BH.conversion_funnel(load(spark, sf_dir, "events"))


# cohort_retention rotated out in r6 — oracle in tests/test_rotated_out.py.


# rotated out r7 (fourth wave) — driver-green r04-r06; oracle kept verbatim
# for tests/test_rotated_out.py.
CLUSTER_DOC_STATS_ORACLE = """
    SELECT e.label,
           count(*) AS n_docs,
           count(DISTINCT d.lang) AS n_langs,
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
           min(d.doc_id) AS min_doc_id
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    GROUP BY e.label ORDER BY e.label
    """


def q_cluster_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cross-modal equi-join: the embedding table's cluster label against the
    # text table's quality columns. Both sides prune to 2-3 columns at scan;
    # the join shuffles only (vec_id, label) vs (doc_id, lang, n_chars).
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        emb.join(docs, emb["vec_id"] == docs["doc_id"])
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("label")
    )


@register("similarity_topk_lsh", _lsh_oracle())
def q_similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.cosine_topk_lsh(load(spark, sf_dir, "embeddings"))


# rotated out r14 (tenth wave) — driver-green r05-r13 (9 rounds);
# oracle kept verbatim for tests/test_rotated_out.py.
# BM25+-style always-positive idf; every score input (tf, dl, df, N,
# sum_dl) is an exact integer, the single float expression is applied
# identically in both engines, then round(...,6) — cross-engine exact.
BM25_TOPK_ORACLE = """
    WITH tl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               string_split(text, ' ') AS toks
        FROM documents
    ),
    scal AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM tl),
    posting AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM tl)
        WHERE term IN ('spark', 'merge', 'window')
        GROUP BY doc_id, dl, term
    ),
    dft AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
    scored AS (
        SELECT doc_id, round(sum(
            ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2)
            / (tf + 1.2 * (1 - 0.75 + 0.75 * dl
                           / (sum_dl / CAST(n_docs AS DOUBLE))))
        ), 6) AS bm25
        FROM posting JOIN dft USING (term) CROSS JOIN scal
        GROUP BY doc_id
    )
    SELECT doc_id, bm25, rank FROM (
        SELECT doc_id, bm25,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM scored)
    WHERE rank <= 10 ORDER BY rank
    """


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BM25 retrieval top-k for a pinned term set (operators/text.py:
    # bm25_topk). Replaced the rows-only similarity_topk_kmeans entry
    # (VERDICT r04 #7): the learned-IVF ANN is iterative by nature and
    # stays NumPy-twin-pinned in tests/test_clustering.py; this one is
    # value-exact against the oracle.
    return TX.bm25_topk(
        load(spark, sf_dir, "documents"), ("spark", "merge", "window"), k=10
    )


# ---------------------------------------------------------------------------
# text analysis (operators/text.py) — documents table
# ---------------------------------------------------------------------------

from compute_histogram_spark.operators import text as TX  # noqa: E402


def _text_profile_oracle() -> str:
    score_cols = []
    for code, words in TX.LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"len(list_filter(toks, t -> t IN ({lst}))) AS s_{code}"
        )
    codes = list(TX.LANG_MARKERS)
    branches = []
    for code in codes:
        conds = " AND ".join(
            f"s_{code} >= s_{other}" for other in codes if other != code
        )
        branches.append(f"WHEN {conds} THEN '{code}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{codes[-1]}' END"
    return f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
    s AS (
        SELECT doc_id,
               length(text) AS n_chars,
               len(toks) AS n_tokens,
               round(length(replace(text, ' ', '')) * 1.0 / len(toks), 6) AS avg_token_len,
               round(len(list_filter(toks,
                     t -> t IN ('the','a','of','and','in','to'))) * 1.0 / len(toks), 6)
                   AS stopword_ratio,
               len(regexp_extract_all(text, '{TX.BPE_PATTERN}')) AS n_bpe_tokens,
               {', '.join(score_cols)}
        FROM t
    )
    SELECT doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
           round(least(1.0, n_tokens / 100.0) * (1.0 - 0.5 * stopword_ratio), 6)
               AS quality_score,
           n_bpe_tokens, {case} AS lang_pred
    FROM s ORDER BY doc_id
    """


# rotated out r16 (twelfth wave) — driver-green r02-r15 (14 rounds);
# oracle kept for tests/test_rotated_out.py and the bench LOCAL fallback
# (HEADLINE still times the Arrow kernel form every round).
TEXT_STATS_ORACLE = _text_profile_oracle()


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the fused text profile (operators/text.py:text_profile): quality
    # stats + whitespace AND BPE-ish token counts + language-ID argmax in
    # ONE scan — absorbs r01's separate token_count / lang_id queries
    # (driver 50-query window), every absorbed column still oracle-exact.
    return TX.text_profile(load(spark, sf_dir, "documents"))


@register(
    "quality_signals",
    # rotated IN late r6: Gopher-style repetition/quality bands (Rae et
    # al. 2021 §A1.1) — map-only scan, modal-bigram count via a per-row
    # sorted-array fold (no explode/groupBy). Oracle lifted verbatim from
    # tests/test_text.py where it was pytest-pinned since r2.
    """
    WITH base AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_words,
               list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
                              i -> string_split(text, ' ')[i] || ' ' ||
                                   string_split(text, ' ')[i+1]) AS g2,
               list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                              i -> string_split(text, ' ')[i] || ' ' ||
                                   string_split(text, ' ')[i+1] || ' ' ||
                                   string_split(text, ' ')[i+2]) AS g3
        FROM documents
    ),
    bg AS (
        SELECT doc_id, unnest(g2) AS gram FROM base
    ),
    modal AS (
        SELECT doc_id, max(c) AS max_run
        FROM (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY 1, 2)
        GROUP BY 1
    ),
    sig AS (
        SELECT b.doc_id,
               CAST(b.n_words AS BIGINT) AS n_words,
               round(list_sum(list_transform(b.toks, x -> length(x))) * 1.0
                     / b.n_words, 6) AS mean_word_len,
               round(len(list_filter(b.toks, x -> regexp_matches(x, '[A-Za-z]')))
                     * 1.0 / b.n_words, 6) AS frac_alpha_words,
               round((b.n_words - len(list_distinct(b.toks))) * 1.0 / b.n_words, 6)
                   AS dup_word_frac,
               CASE WHEN len(b.g2) > 0
                    THEN round(coalesce(m.max_run, 0) * 1.0 / len(b.g2), 6)
                    ELSE 0.0 END AS top_bigram_frac,
               CASE WHEN len(b.g3) > 0
                    THEN round((len(b.g3) - len(list_distinct(b.g3))) * 1.0
                               / len(b.g3), 6)
                    ELSE 0.0 END AS dup_trigram_frac
        FROM base b LEFT JOIN modal m USING (doc_id)
    )
    SELECT *,
           (n_words >= 10 AND n_words <= 100000
            AND mean_word_len >= 2.0 AND mean_word_len <= 10.0
            AND frac_alpha_words >= 0.8
            AND top_bigram_frac <= 0.2) AS gopher_pass
    FROM sig ORDER BY doc_id
    """,
)
def q_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.quality_signals(load(spark, sf_dir, "documents"))


# rotated out r7 (fourth wave) — driver-green r03-r06; oracle kept verbatim
# for tests/test_rotated_out.py. The oracle pins md5 specifically, so it
# drives the md5 twin; the production op (q_doc_fingerprint, benched) moved
# to xxhash64 in r8 and is value-pinned against a pure-Python XXH64 twin in
# tests/test_text.py instead.
DOC_FINGERPRINT_ORACLE = """
    WITH g AS (
        SELECT doc_id, substr(text, gg, 8) AS gr
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS gg
            FROM documents
        )
    )
    SELECT doc_id, min(md5(gr)) AS fingerprint,
           CAST(count(DISTINCT gr) AS BIGINT) AS n_grams
    FROM g GROUP BY doc_id ORDER BY doc_id
    """

# throughput-fair DuckDB twin of the xxhash64 kernel for the two-engine
# bench sweeps: same grams, min over DuckDB's native 64-bit hash() — the
# sweeps compare wall time, not values (each engine runs its native
# non-cryptographic hash; the md5-vs-md5 pairing above remains the
# value-exact correctness check)
DOC_FINGERPRINT_BENCH_ORACLE = """
    WITH g AS (
        SELECT doc_id, substr(text, gg, 8) AS gr
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS gg
            FROM documents
        )
    )
    SELECT doc_id, CAST(min(hash(gr)) AS BIGINT) AS fingerprint,
           CAST(count(DISTINCT gr) AS BIGINT) AS n_grams
    FROM g GROUP BY doc_id ORDER BY doc_id
    """


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_fingerprint(load(spark, sf_dir, "documents"))


def q_doc_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_fingerprint_md5(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal (multimodal/binary.py): Arrow-batched mapInPandas feature
# extraction over binary payloads. The stub decoder is deterministic
# (sha256-derived dims), so even the Python-kernel path gets a value-exact
# DuckDB oracle — the strongest check available without real codecs.
# ---------------------------------------------------------------------------

from compute_histogram_spark.multimodal import binary as MM  # noqa: E402


def _mm_nib(i: int) -> str:
    return f"(instr('0123456789abcdef', substr(h, {i}, 1)) - 1)"


# rotated out r10 (sixth wave) — driver-green r02-r09; oracle kept
# verbatim for tests/test_rotated_out.py (the multimodal tier stays
# pytest-covered by the full codec fixture grids in tests/test_binary.py,
# test_geotiff.py, test_mp3.py, test_aac_ogg.py, test_h264.py).
MULTIMODAL_FEATURES_ORACLE = f"""
    WITH a AS (
        SELECT doc_id AS asset_id, 'image' AS kind, text FROM documents
    ),
    f AS (SELECT asset_id, kind, octet_length(encode(text)) AS n_bytes,
                 sha256(text) AS h FROM a)
    SELECT asset_id, kind, n_bytes, h AS sha256,
           CAST(16 + ({_mm_nib(1)} * 16 + {_mm_nib(2)}) % 240 AS INT) AS width,
           CAST(16 + ({_mm_nib(3)} * 16 + {_mm_nib(4)}) % 240 AS INT) AS height,
           CAST(1 + ({_mm_nib(5)} * 16 + {_mm_nib(6)}) % 3 AS INT) AS n_channels
    FROM f ORDER BY asset_id
    """


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = MM.assets_from_documents(load(spark, sf_dir, "documents"))
    return MM.extract_features(assets).orderBy("asset_id")


@register(
    "corpus_pipeline",
    """
    WITH kept AS (
        -- exact dedup: keep the lowest doc_id per distinct text
        SELECT min(doc_id) AS doc_id, text, lang,
               count(*) AS n_copies
        FROM documents GROUP BY text, lang
    ),
    toks AS (
        SELECT doc_id, lang, n_copies, string_split(text, ' ') AS t,
               length(text) AS n_chars
        FROM kept
    ),
    q AS (
        SELECT doc_id, lang, n_copies, n_chars, len(t) AS n_tokens,
               round(len(list_filter(t,
                     x -> x IN ('the','a','of','and','in','to'))) * 1.0
                     / len(t), 6) AS stopword_ratio
        FROM toks
    ),
    f AS (
        SELECT * FROM q
        WHERE n_tokens >= 5 AND stopword_ratio <= 0.5
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dupes_removed,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM f GROUP BY lang ORDER BY lang
    """,
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data shape: dedup -> quality gate -> corpus
    stats, chained as ONE lazy plan (Catalyst fuses the stages; the dedup
    shuffle is the only wide dependency before the final per-lang agg).

    r13 ADOPTED (tools/ab_corpus_r13.py, min-of-3 interleaved,
    value-exact at both test SFs): per-doc stats computed map-side
    BEFORE the dedup groupBy, so the shuffle carries (sha2, lang, three
    ints) and never the text itself. At sf10 the three dedup-key shapes
    are a wash (~1.2 s); at sf100 the byte diet separates decisively —
    incumbent carry-the-text 7.66 s, groupBy(text) 6.10 s, THIS form
    4.11 s (-46%) — the per-doc recompute on the 1000x-duplicated tile
    is cheaper than shuffling distinct texts (and on low-dup real
    crawls the trade only improves).

    r15: the dedup key shuffles as 32 RAW BYTES (unhex of the sha2 hex)
    instead of the 64-char hex string — same byte-diet logic one level
    down; sf100 warm 5.19 -> 3.84 s (-26%), value-equal (the digest
    never reaches the output). Remaining floor is the text scan + sha2
    + tokenization map work, measured this round at ~2.6x an in-process
    comparator that does the same single pass without JVM<->Tungsten
    row transitions."""
    docs = load(spark, sf_dir, "documents")
    stop = F.array([F.lit(w) for w in ("the", "a", "of", "and", "in", "to")])
    t = F.split("text", " ")
    per_doc = docs.select(
        F.unhex(F.sha2("text", 256)).alias("h"),
        "lang",
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(t).alias("n_tokens"),
        F.round(
            F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
            * 1.0
            / F.size(t),
            6,
        ).alias("stopword_ratio"),
    )
    kept = per_doc.groupBy("h", "lang").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.first("n_chars").alias("n_chars"),
        F.first("n_tokens").alias("n_tokens"),
        F.first("stopword_ratio").alias("stopword_ratio"),
    )
    f = kept.where(
        (F.col("n_tokens") >= 5) & (F.col("stopword_ratio") <= 0.5)
    )
    return (
        f.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_copies") - F.count(F.lit(1))).alias("n_dupes_removed"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


# rotated out r7 (fourth wave) — driver-green r03-r06; oracle kept verbatim
# for tests/test_rotated_out.py.
TOP_TOKENS_ORACLE = """
    WITH c AS (
        SELECT lang, token, count(*) AS n
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY lang, token
    ),
    r AS (
        SELECT lang, token, n,
               CAST(row_number() OVER (
                   PARTITION BY lang ORDER BY n DESC, token
               ) AS INT) AS rnk
        FROM c
    )
    SELECT lang, rnk, token, n FROM r WHERE rnk <= 5
    ORDER BY lang, rnk
    """


def q_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.top_tokens_per_lang(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# round-6 window rotation (VERDICT r05 #1): the round-5 operators with
# DuckDB-twin evidence graduate into the driver window so they earn green
# CORRECTNESS rows. Oracles are the (already-passing) pytest twins, lifted
# verbatim; the rotated-out entries keep theirs in tests/test_rotated_out.py.
# ---------------------------------------------------------------------------

from compute_histogram_spark.operators import behavior as BH  # noqa: E402,F401
from compute_histogram_spark.operators import incremental as INC  # noqa: E402
from compute_histogram_spark.operators import pipeline as PL  # noqa: E402
from compute_histogram_spark.operators import profile as PR  # noqa: E402


# rotated out r14 (tenth wave) — driver-green r06-r13 (8 rounds);
# oracle kept verbatim for tests/test_rotated_out.py.
TOKEN_PMI_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    p AS (
        SELECT ts[i] AS a, ts[i + 1] AS b
        FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM t
              WHERE len(ts) >= 2)
    ),
    pc AS (SELECT a, b, count(*) AS n_pair FROM p GROUP BY a, b),
    la AS (SELECT a, count(*) AS n_a FROM p GROUP BY a),
    rb AS (SELECT b, count(*) AS n_b FROM p GROUP BY b),
    tot AS (SELECT count(*) AS n_total FROM p)
    SELECT a, b, n_pair, pmi FROM (
        SELECT a, b, n_pair,
               round(ln(CAST(n_pair AS DOUBLE) * n_total
                        / (CAST(n_a AS DOUBLE) * n_b)), 6) AS pmi,
               row_number() OVER (ORDER BY
                   round(ln(CAST(n_pair AS DOUBLE) * n_total
                            / (CAST(n_a AS DOUBLE) * n_b)), 6) DESC, a, b)
                   AS rnk
        FROM pc JOIN la USING (a) JOIN rb USING (b) CROSS JOIN tot
        WHERE n_pair >= 3
    ) WHERE rnk <= 50 ORDER BY pmi DESC, a, b
    """


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # adjacent-pair collocations by PMI (operators/text.py:token_pmi):
    # map-side pair explode, three bounded aggregations, exact-integer
    # inputs to one rounded ln.
    return TX.token_pmi(load(spark, sf_dir, "documents"), min_count=3, k=50)


# rotated out r13 (ninth wave, for the staged r12 twins) — driver-green
# r07-r12; oracle kept verbatim for tests/test_rotated_out.py.
DISTRIBUTION_DRIFT_ORACLE = """
    WITH r AS (
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n_ref
        FROM events WHERE event_type != 'purchase'
          AND value IS NOT NULL AND NOT isnan(value) GROUP BY 1
    ),
    c AS (
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n_cur
        FROM events WHERE event_type = 'purchase'
          AND value IS NOT NULL AND NOT isnan(value) GROUP BY 1
    ),
    j AS (
        SELECT COALESCE(r.bin, c.bin) AS bin,
               COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        FROM r FULL OUTER JOIN c ON r.bin = c.bin
    ),
    t AS (SELECT sum(n_ref) t_ref, sum(n_cur) t_cur, count(*) n_bins FROM j)
    SELECT bin, bin * 50.0 AS bin_value, n_ref, n_cur,
           round(
             ((n_cur + 0.5) / (t_cur + 0.5 * n_bins)
              - (n_ref + 0.5) / (t_ref + 0.5 * n_bins))
             * ln(((n_cur + 0.5) / (t_cur + 0.5 * n_bins))
                  / ((n_ref + 0.5) / (t_ref + 0.5 * n_bins))), 6)
             AS psi_term
    FROM j CROSS JOIN t ORDER BY bin
    """


def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PSI drift between the non-purchase (reference) and purchase (current)
    # value distributions — bin-bounded aggs, one broadcast scalar row.
    ev = load(spark, sf_dir, "events")
    return PR.distribution_drift(
        ev.where(F.col("event_type") != "purchase"),
        ev.where(F.col("event_type") == "purchase"),
    )


# rotated out r12 (eighth wave) — driver-green r07-r11; oracle kept
# verbatim for tests/test_rotated_out.py.
ROBUST_OUTLIERS_ORACLE = """
    WITH clean AS (
        SELECT event_type AS "group", value AS x FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    med AS (
        SELECT "group", round(median(x), 6) AS median FROM clean GROUP BY 1
    ),
    dev AS (
        SELECT c."group", c.x, m.median, abs(c.x - m.median) AS adev
        FROM clean c JOIN med m USING ("group")
    ),
    mad AS (
        SELECT "group", round(median(adev), 6) AS mad FROM dev GROUP BY 1
    )
    SELECT d."group",
           count(*) AS n_rows,
           any_value(d.median) AS median,
           any_value(md.mad) AS mad,
           count(CASE WHEN md.mad > 0
                       AND 0.6745 * d.adev / md.mad > 3.5 THEN 1 END)
               AS n_outliers
    FROM dev d JOIN mad md USING ("group")
    GROUP BY 1 ORDER BY 1
    """


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # median/MAD modified z-score outlier report per event_type
    # (operators/profile.py:robust_outliers) — group-bounded aggregations
    # with broadcast join-backs, zero-MAD groups guarded.
    return PR.robust_outliers(load(spark, sf_dir, "events"))


# rotated out r12 (eighth wave) — driver-green r07-r11; oracle kept
# verbatim for tests/test_rotated_out.py.
ROLLING_USER_STATS_ORACLE = """
    WITH b AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsu,
               CASE WHEN value IS NOT NULL AND NOT isnan(value)
                    THEN CAST(round(value * 100) AS BIGINT) END AS cents
        FROM events
    )
    SELECT user_id, event_id, tsu,
           count(*) OVER w AS n_window,
           COALESCE(sum(cents) OVER w, 0) / 100.0 AS sum_value
    FROM b
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, tsu, event_id
    """


def q_rolling_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trailing-1h RANGE-frame per-user count/sum (operators/windows.py):
    # exact integer-micros frame bounds, integer-cents money sums.
    return W.rolling_user_stats(load(spark, sf_dir, "events"))


# rotated out r11 (seventh wave) — driver-green r06-r10; oracle kept
# verbatim for tests/test_rotated_out.py. `sessionize` (same answer,
# unsalted plan) stays in the window; the salted plan's output-equality
# proof lives in tests/test_sessionize_salted.py.
SESSIONIZE_SALTED_ORACLE = (
    # identical answer to `sessionize` (the salt is a physical-plan change,
    # proven output-identical in tests/test_sessionize_salted.py), so the
    # oracle SQL is the same text — BOTH plans carried driver evidence
    # r06-r10.
    """
    WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
    l AS (
        SELECT *, lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
        FROM t
    ),
    f AS (
        SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS is_new
        FROM l
    ),
    s AS (
        SELECT *, CAST(sum(is_new) OVER (
            PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING
        ) AS BIGINT) AS session_id
        FROM f
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(tsu) AS start_us, max(tsu) AS end_us,
           (max(tsu) - min(tsu)) / 1000000 AS duration_s
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """
)


def q_sessionize_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hot-key-safe sessionization (operators/windows.py:sessionize_salted):
    # per-(user, day-bucket) local pass + per-user stitch over session
    # summaries — no window partition ever holds one user's whole history.
    return W.sessionize_salted(load(spark, sf_dir, "events"))


# rotated out r11 (seventh wave) — driver-green r06-r10; oracle kept
# verbatim for tests/test_rotated_out.py. `asof_join` (same answer,
# unsalted plan) stays in the window; stitching proof in
# tests/test_temporal.py.
ASOF_JOIN_SALTED_ORACLE = (
    # identical answer to `asof_join`, same oracle text.
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events),
    o AS (
        SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS odu, o_totalprice
        FROM orders
    ),
    j AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.odu, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.odu DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM e LEFT JOIN o ON o.o_custkey = e.user_id AND o.odu <= e.tsu
    )
    SELECT event_id, user_id,
           o_orderkey AS asof_orderkey,
           odu AS asof_order_us,
           o_totalprice AS asof_totalprice
    FROM j WHERE rn = 1 ORDER BY event_id
    """
)


def q_asof_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hot-key-safe as-of enrichment (temporal.py:asof_join_salted): the
    # union+carry window runs per (key, day-bucket), then per-key stitch
    # over bucket summaries.
    return T.asof_enrich_events_salted(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "orders")
    )


# rotated out r13 (ninth wave) — driver-green r06-r12; oracle kept
# verbatim for tests/test_rotated_out.py.
WEIGHTED_SAMPLE_ORACLE = """
    SELECT doc_id, sample_key FROM (
        SELECT doc_id,
               round(ln((('0x' || substring(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                         % 1000000 + 1.0) / 1000000.0)
                     / CAST(n_chars AS DOUBLE), 12) AS sample_key
        FROM documents WHERE n_chars > 0
    ) ORDER BY sample_key DESC, doc_id LIMIT 100
    """


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic A-ES weighted sampling without replacement
    # (pipeline.py:weighted_sample): hash-derived uniforms, top-n keys via
    # TakeOrdered — reproducible across engines and runs.
    docs = load(spark, sf_dir, "documents")
    return PL.weighted_sample(
        docs.withColumn("w", F.col("n_chars").cast("double")), "w", n=100
    ).select("doc_id", "sample_key")


# rotated out r13 (ninth wave) — driver-green r07-r12; oracle kept
# verbatim for tests/test_rotated_out.py.
PHRASE_MATCH_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    p AS (
        SELECT doc_id, i, ts[i] AS tok
        FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
              FROM t)
    ),
    m AS (
        SELECT p0.doc_id
        FROM p p0 JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.i = p0.i + 1
        WHERE p0.tok = 'sort' AND p1.tok = 'merge'
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
    FROM m GROUP BY doc_id ORDER BY doc_id
    """


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    # positional-postings phrase search (text.py:phrase_match): one
    # pre-filtered index slice per term, |phrase|-way equi-join on
    # (doc_id, start) — counts every distinct start (overlaps included),
    # which the oracle reproduces positionally.
    idx = TX.build_postings(load(spark, sf_dir, "documents"))
    return TX.phrase_match(idx, "sort merge")


# rotated out r12 (eighth wave) — driver-green r07-r11; oracle kept
# verbatim for tests/test_rotated_out.py.
SCD2_INTERVALS_ORACLE = """
    WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS tsu FROM events
    ),
    flagged AS (
        SELECT user_id, event_type, tsu, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                         AND lag(tsu) OVER w IS NULL THEN 1
                    WHEN event_type IS DISTINCT FROM lag(event_type) OVER w THEN 1
                    ELSE 0 END AS chg
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
    ),
    runs AS (SELECT * FROM flagged WHERE chg = 1)
    SELECT user_id, event_type, tsu AS valid_from,
           lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS valid_to
    FROM runs
    ORDER BY user_id, valid_from
    """


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gaps-and-islands SCD2 history of each user's event_type state
    # (temporal.py:scd2_intervals via user_state_history): per-key windows
    # only, run-collapse then interval bounds.
    return T.user_state_history(load(spark, sf_dir, "events"))


# rotated out r13 (ninth wave) — driver-green r07-r12; oracle kept
# verbatim for tests/test_rotated_out.py.
APPLY_CHANGES_ORACLE = """
    WITH snap AS (SELECT o_orderkey, o_totalprice FROM orders),
    changes AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 17 = 3 THEN o_totalprice + 5.0
                    ELSE o_totalprice END AS o_totalprice,
               1 AS seq,
               CASE WHEN o_orderkey % 17 = 3 THEN 'u' ELSE 'd' END AS op
        FROM orders WHERE o_orderkey % 17 IN (3, 5)
        UNION ALL
        SELECT o_orderkey, o_totalprice + 1.0, 2,
               CASE WHEN o_orderkey % 17 = 3 THEN 'd' ELSE 'u' END
        FROM orders WHERE o_orderkey % 17 IN (3, 5)
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_orderkey ORDER BY seq DESC, op ASC) AS rn
            FROM changes) WHERE rn = 1
    )
    SELECT o_orderkey, o_totalprice FROM snap
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM latest WHERE op = 'u'
    ORDER BY o_orderkey
    """


def q_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDC MERGE (incremental.py:apply_changes via orders_upsert_demo):
    # latest-change-wins dedup of the feed, then an outer-join merge —
    # every branch (insert / update / delete / seq tie) exercised by the
    # deterministic synthetic feed.
    return INC.orders_upsert_demo(load(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# round-7 window rotation (VERDICT r06 #3): the round-6 operators with
# DuckDB-twin evidence graduate into the driver window. Rotated out to make
# room (oracles kept above + re-checked in tests/test_rotated_out.py):
# doc_fingerprint, cluster_doc_stats, top_tokens_per_lang, event_transitions,
# similarity_topk_gemm.
# ---------------------------------------------------------------------------

from compute_histogram_spark.operators import lm as LM  # noqa: E402


# rotated out r14 (tenth wave) — driver-green r07-r13 (7 rounds);
# oracle kept verbatim for tests/test_rotated_out.py.
# add-k (k=0.5) bigram self-perplexity (operators/lm.py:doc_perplexity —
# the CCNet-style quality signal). Counts and vocab size are exact
# integers in both engines; the only floats are the per-bigram ln and
# the final mean/exp, rounded to 6 decimals on both sides. Docs with
# < 2 tokens emit n_bigrams = 0 and NULL avg_nll/ppl.
DOC_PERPLEXITY_ORACLE = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    pairs AS (
        SELECT doc_id, ts[i] AS v, ts[i+1] AS w
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(ts) - 1)) AS i
        )
    ),
    big AS (SELECT v, w, count(*) AS c_vw FROM pairs GROUP BY v, w),
    ctx AS (SELECT v, count(*) AS c_v FROM pairs GROUP BY v),
    voc AS (SELECT count(DISTINCT w) AS nv FROM pairs),
    per AS (
        SELECT p.doc_id, count(*) AS n_bigrams,
               sum(ln((ctx.c_v + 0.5 * voc.nv) / (big.c_vw + 0.5))) AS nll
        FROM pairs p
        JOIN big USING (v, w) JOIN ctx USING (v) CROSS JOIN voc
        GROUP BY p.doc_id
    )
    SELECT t.doc_id,
           COALESCE(per.n_bigrams, 0) AS n_bigrams,
           round(per.nll / per.n_bigrams, 6) AS avg_nll,
           round(exp(per.nll / per.n_bigrams), 6) AS ppl
    FROM toks t LEFT JOIN per USING (doc_id)
    ORDER BY doc_id
    """


def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return LM.doc_perplexity(load(spark, sf_dir, "documents"))


# rotated out r11 (seventh wave) — driver-green r05-r10; oracle kept
# verbatim for tests/test_rotated_out.py. The LM-scoring family stays
# driver-covered by doc_perplexity (add-k bigram).
DOC_PERPLEXITY_BACKOFF_ORACLE = (
    # stupid-backoff trigram self-score (operators/lm.py:
    # doc_perplexity_backoff). Self-scoring means the trigram branch always
    # fires, so the oracle needs only the trigram/context count tables —
    # exact-integer ratios into one ln, rounded to 6 on both sides.
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    tri AS (
        SELECT doc_id, ts[i] AS v1, ts[i+1] AS v2, ts[i+2] AS v3
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(ts) - 2)) AS i
        )
    ),
    c3 AS (SELECT v1, v2, v3, count(*) AS c3 FROM tri GROUP BY 1, 2, 3),
    c2 AS (SELECT v1, v2, count(*) AS c2ctx FROM tri GROUP BY 1, 2),
    per AS (
        SELECT t.doc_id, count(*) AS n_trigrams,
               sum(-ln(c3.c3 / c2.c2ctx)) AS nls
        FROM tri t JOIN c3 USING (v1, v2, v3) JOIN c2 USING (v1, v2)
        GROUP BY t.doc_id
    )
    SELECT k.doc_id,
           COALESCE(per.n_trigrams, 0) AS n_trigrams,
           round(per.nls / per.n_trigrams, 6) AS avg_nls,
           round(exp(-per.nls / per.n_trigrams), 6) AS score
    FROM toks k LEFT JOIN per USING (doc_id)
    ORDER BY doc_id
    """
)


def q_doc_perplexity_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return LM.doc_perplexity_backoff(load(spark, sf_dir, "documents"))


# rotated out r16 (twelfth wave) — driver-green r07-r15 (9 rounds);
# oracle kept verbatim for tests/test_rotated_out.py.
TEMPERATURE_MIX_ORACLE = (
    # temperature-resampled corpus (pipeline.py:temperature_mix, alpha=0.5
    # over lang): per-group rates are round(q_g * total / n_g, 2) with
    # q proportional to p^alpha — the mBERT/XLM-R alpha-sampling scheme —
    # feeding the deterministic hash-gated mix_corpus (floor(rate) copies
    # plus an md5-bucket fractional copy; 'mix:' salt). The rate arithmetic
    # is reproduced in SQL: identical double ops, and the 2-decimal/
    # frac-percent roundings never land on representable half-way points
    # (see mix_corpus notes), so both engines derive identical copy counts.
    """
    WITH counts AS (
        SELECT lang AS g, count(*) AS n FROM documents
        WHERE lang IS NOT NULL GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM counts),
    w AS (SELECT g, n, pow(n / t.total, 0.5) AS wt FROM counts, t),
    z AS (SELECT sum(wt) AS zz FROM w),
    rates AS (
        SELECT g, round(wt / z.zz * t.total / n, 2) AS rate
        FROM w, z, t
    ),
    b AS (
        SELECT d.*, r.rate,
               ('0x' || substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
                                  1, 8))::BIGINT % 100 AS bk
        FROM documents d JOIN rates r ON d.lang = r.g
    ),
    nc AS (
        SELECT *, CAST(floor(rate) AS BIGINT)
            + CASE WHEN bk < round((rate - floor(rate)) * 100)
                   THEN 1 ELSE 0 END AS n_copies
        FROM b
    )
    SELECT doc_id, text, lang, source, n_chars, copy_id
    FROM nc, LATERAL (
        SELECT unnest(generate_series(1, n_copies)) AS copy_id
    )
    WHERE n_copies > 0
    ORDER BY doc_id, copy_id
    """
)


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = PL.temperature_mix(
        load(spark, sf_dir, "documents"), group_col="lang", alpha=0.5
    )
    # copy_id comes off posexplode(sequence(int)) as INT; the oracle's
    # generate_series is BIGINT — align dtypes for the schema check
    return out.withColumn("copy_id", F.col("copy_id").cast("bigint")).orderBy(
        "doc_id", "copy_id"
    )


# rotated out r13 (ninth wave) — driver-green r07-r12; oracle kept
# verbatim for tests/test_rotated_out.py.
# per-hour peak of the sweep-line concurrency curve (behavior.py:
# peak_concurrency over windows.sessionize): all-integer output. The
# Spark plan is the bucket-partitioned two-phase prefix sum (no global
# sort); the oracle is the single-node global-window sweep. Only
# buckets containing a change point emit a row (gap buckets carry the
# previous exit level — see the operator docstring).
PEAK_CONCURRENCY_ORACLE = """
    WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
    l AS (
        SELECT *, lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
        FROM t
    ),
    f AS (
        SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS is_new
        FROM l
    ),
    s AS (
        SELECT *, CAST(sum(is_new) OVER (
            PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING
        ) AS BIGINT) AS session_id
        FROM f
    ),
    sess AS (
        SELECT user_id, session_id, min(tsu) AS start_us, max(tsu) AS end_us
        FROM s GROUP BY user_id, session_id
    ),
    d AS (
        SELECT start_us AS ts_us, 1 AS d FROM sess
        UNION ALL SELECT end_us + 1, -1 FROM sess
    ),
    g AS (SELECT ts_us, sum(d) AS d FROM d GROUP BY ts_us),
    curve AS (
        SELECT ts_us, CAST(sum(d) OVER (ORDER BY ts_us) AS BIGINT) AS n,
               ts_us // 3600000000 AS bkt
        FROM g
    ),
    per AS (
        SELECT bkt, max(n) AS peak_inside, arg_max(n, ts_us) AS exit_level
        FROM curve GROUP BY bkt
    )
    SELECT CAST(bkt * 3600 AS BIGINT) AS bucket_start_s,
           greatest(peak_inside,
                    coalesce(lag(exit_level) OVER (ORDER BY bkt), 0))
               AS peak_active
    FROM per ORDER BY bucket_start_s
    """


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return BH.peak_concurrency(
        W.sessionize(load(spark, sf_dir, "events")), bucket_s=3600
    )


@register(
    "neardup_dedup",
    # end-to-end near-duplicate REMOVAL (dedup.py:neardup_dedup): minhash-
    # LSH candidate pairs -> connected components -> keep min doc_id per
    # cluster -> anti-join. Output is the surviving corpus with original
    # schema — the oracle resolves the same min-label fixpoint with a
    # recursive CTE and removes the same loser set.
    f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    e AS (
        SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
        UNION SELECT doc_id_2, doc_id_1 FROM pairs
    ),
    reach(node, r) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    losers AS (SELECT node AS doc_id FROM comp WHERE node != component)
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    ORDER BY d.doc_id
    """,
)
def q_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.neardup_dedup(load(spark, sf_dir, "documents")).orderBy("doc_id")


# ROTATED IN r10 (sixth wave, alongside
# SIMILARITY_PQ_ORACLE): PageRank over the event-type transition graph.
# Iterative operators are normally no-SQL (BPE, Lloyd's k-means), but a
# FIXED-iteration power method with per-iteration round-9 is pure
# arithmetic — the iterations unroll into chained CTEs generated below,
# and the per-iteration rounding absorbs cross-engine summation noise
# before it can compound (the 6-decimal-cosine argument). Value-exact at
# sf0.001 and sf0.01 (tests/test_graph.py pins it until it enters the
# window).
def _pagerank_oracle(iters: int = 10) -> str:
    head = """
    WITH t AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS to_type
        FROM events
    ),
    e AS (
        SELECT from_type AS src, to_type AS dst,
               CAST(count(*) AS DOUBLE) AS w
        FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
    ),
    ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
    frac AS (
        SELECT e.src, e.dst, e.w / ow.ow AS f
        FROM e JOIN ow ON ow.src = e.src
    ),
    nodes AS (
        SELECT DISTINCT src AS node FROM e
        UNION SELECT DISTINCT dst FROM e
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, round(1.0 / nn.n, 9) AS pr FROM nodes CROSS JOIN nn)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
    c{i} AS (
        SELECT frac.dst AS node, sum(r{i - 1}.pr * frac.f) AS c
        FROM frac JOIN r{i - 1} ON r{i - 1}.node = frac.src
        GROUP BY frac.dst
    ),
    r{i} AS (
        SELECT nodes.node,
               round((1 - 0.85) / nn.n + 0.85 * coalesce(c{i}.c, 0.0), 9)
                   AS pr
        FROM nodes CROSS JOIN nn
        LEFT JOIN c{i} ON c{i}.node = nodes.node
    )""")
    return head + "".join(steps) + f"""
    SELECT node, pr FROM r{iters} ORDER BY node"""


EVENT_PAGERANK_ORACLE = _pagerank_oracle(10)


@register("event_pagerank", EVENT_PAGERANK_ORACLE)
def q_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # behavior.event_transitions (driver-green since r01) supplies the
    # weighted digraph; graph.pagerank ranks event types by steady-state
    # visit mass — the iterative-ranking showcase next to dedup_clusters'
    # fixpoint CC. Fixed 10 iterations, damping 0.85, round-9 per
    # iteration (determinism contract in the operator docstring).
    from compute_histogram_spark.operators import behavior as BH
    from compute_histogram_spark.operators import graph as G

    trans = BH.event_transitions(load(spark, sf_dir, "events"))
    return G.pagerank(
        trans, src="from_type", dst="to_type", weight="n_transitions"
    )


# ROTATED IN r10 (sixth wave, with SIMILARITY_PQ_ORACLE
# and EVENT_PAGERANK_ORACLE): the sketch family's first value-exact twin.
# The production KMV hashes with JVM xxhash64 (no cross-engine
# reproduction); the portable variant hashes md5('kmv:' || value) per the
# texthash convention, so DuckDB replicates digest order, the k-th
# minimum, and the (k-1)/u_k estimate to the digit. k=64 straddles the
# test SFs: sf0.001 has < 64 distinct users (exact-count branch),
# sf0.01 has more (estimator branch) — both CASE arms oracle-covered.
DISTINCT_USERS_KMV_ORACLE = """
    WITH hs AS (
        SELECT DISTINCT md5('kmv:' || CAST(user_id AS VARCHAR)) AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    k AS (SELECT h FROM hs ORDER BY h LIMIT 64),
    a AS (SELECT max(h) AS kth_hex, count(*) AS n FROM k)
    SELECT CAST(n AS INT) AS k_used, kth_hex,
           round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                 ELSE 63 / ((CAST(('0x' || substring(kth_hex, 1, 12))
                                  AS BIGINT) + 1) / 281474976710656.0)
                 END, 6) AS distinct_est
    FROM a
    """


@register("distinct_users_kmv", DISTINCT_USERS_KMV_ORACLE)
def q_distinct_users_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import sketches as SK

    return SK.kmv_distinct_portable(load(spark, sf_dir, "events"), "user_id")


# ROTATED IN r10 (sixth wave — fourth twin): CMS point
# estimates with portable md5 bucketing, probed at the deterministic
# exact top-10 tokens. The overestimate-only CMS invariant shows up IN
# the oracle-checked data (cms_est >= n_exact on every row).
TOKEN_CMS_ORACLE = """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cells AS (
        SELECT i.i AS r,
               CAST(('0x' || substring(
                   md5('cms' || CAST(i.i AS VARCHAR) || ':' || tok), 1, 8))
                   AS BIGINT) % 1024 AS b
        FROM toks
        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i
    ),
    cms AS (SELECT r, b, count(*) AS cnt FROM cells GROUP BY 1, 2),
    top AS (
        SELECT tok, count(*) AS n_exact FROM toks
        GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 10
    ),
    probes AS (
        SELECT tok, n_exact, i.i AS r,
               CAST(('0x' || substring(
                   md5('cms' || CAST(i.i AS VARCHAR) || ':' || tok), 1, 8))
                   AS BIGINT) % 1024 AS b
        FROM top CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i
    )
    SELECT probes.tok, probes.n_exact, min(cms.cnt) AS cms_est
    FROM probes JOIN cms ON cms.r = probes.r AND cms.b = probes.b
    GROUP BY 1, 2
    ORDER BY probes.tok
    """


# rotated out r16 (twelfth wave — token_bloom takes the sketch slot) —
# driver-green r10-r15; oracle kept for tests/test_rotated_out.py.
def q_token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import sketches as SK

    return SK.cms_point_estimates_portable(load(spark, sf_dir, "documents"))


# ROTATION-READY (staged for the 7th wave, r11): the BPE family's first
# value-exact DuckDB twins. The blocker was never the arithmetic — it was
# expressing the left-to-right NON-OVERLAPPING merge fold in SQL. The
# portable encoding: a word's symbol list becomes a chr(31)-framed string
# (SEP SEP s1 SEP SEP s2 ... SEP SEP); merging pair (a, b) is then ONE
# standard `replace(s, SEP a SEP SEP b SEP, SEP ab SEP)` — SQL replace
# scans left to right, never rescans its own replacement, and the
# asymmetric separator consumption makes consecutive merges chain exactly
# like the Catalyst `aggregate` fold in operators/bpe.py:_merge_expr
# (equivalence pinned on the adversarial cases — 'xxxx'/(x,x),
# 'banana'/chained merges — in tests/test_bpe.py).

_BPE_SEP = "chr(31)"
_BPE_SEP2 = "chr(31)||chr(31)"

# fixed merge list for the SEGMENT twin: exercises single merges, chained
# merges (a+g then ag+g), and merges whose operands are themselves merge
# products (tab+le) — the order-sensitivity the fold semantics live on
BPE_SEGMENT_MERGES = [
    ("a", "g"), ("ag", "g"), ("l", "e"),
    ("t", "a"), ("ta", "b"), ("tab", "le"),
]


def _bpe_enc(col: str) -> str:
    """word -> SEP SEP c1 SEP SEP c2 ... SEP SEP (DuckDB expression)."""
    return (
        f"{_BPE_SEP2}||regexp_replace({col}, '(.)', "
        f"'\\1'||{_BPE_SEP2}, 'g')"
    )


def _bpe_apply(expr: str, a: str, b: str) -> str:
    pat = f"{_BPE_SEP}||'{a}'||{_BPE_SEP2}||'{b}'||{_BPE_SEP}"
    rep = f"{_BPE_SEP}||'{a}{b}'||{_BPE_SEP}"
    return f"replace({expr}, {pat}, {rep})"


def _bpe_segment_oracle() -> str:
    expr = _bpe_enc("word")
    for a, b in BPE_SEGMENT_MERGES:
        expr = _bpe_apply(expr, a, b)
    return f"""
    WITH wf AS (
        SELECT DISTINCT word FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word != ''
    ),
    seg AS (
        SELECT word,
               string_split(trim({expr}, {_BPE_SEP}), {_BPE_SEP2}) AS l
        FROM wf
    )
    SELECT word, CAST(len(l) AS INT) AS n_syms,
           array_to_string(l, ' ') AS segmented
    FROM seg ORDER BY word
    """


BPE_SEGMENT_ORACLE = _bpe_segment_oracle()


# ROTATED IN r11 (seventh wave, replacing shipping_priority /
# similarity_topk_sq / sessionize_salted / asof_join_salted /
# doc_perplexity_backoff): first driver exposure for the tokenizer family.
@register("bpe_segment", BPE_SEGMENT_ORACLE)
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import bpe as BPE

    words = BPE.word_freqs(load(spark, sf_dir, "documents")).select("word")
    seg = BPE.bpe_segment(words, BPE_SEGMENT_MERGES)
    return seg.select(
        "word",
        F.size("syms").alias("n_syms"),
        F.concat_ws(" ", "syms").alias("segmented"),
    ).orderBy("word")


def _bpe_train_oracle(num_merges: int = 6) -> str:
    """The TRAINING loop unrolled — per round: weighted adjacent-pair
    counts over the current segmentation state, argmax with the
    (cnt DESC, a, b) tie-break, then the data-driven merge applied via
    the same replace encoding (pattern built FROM the argmax row). An
    early stop (no pair >= min_freq 2) cascades naturally: the empty
    argmax CTE empties every later round, so both engines emit exactly
    the merges found."""
    head = f"""
    WITH wf AS (
        SELECT word, count(*) AS weight FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word != '' GROUP BY word
    ),
    v0 AS (SELECT word, weight, {_bpe_enc("word")} AS s FROM wf)"""
    steps = []
    for i in range(1, num_merges + 1):
        steps.append(f""",
    l{i} AS (
        SELECT weight,
               string_split(trim(s, {_BPE_SEP}), {_BPE_SEP2}) AS l
        FROM v{i - 1}
    ),
    p{i} AS (
        SELECT a, b, sum(weight) AS cnt FROM (
            SELECT weight, l[g] AS a, l[g + 1] AS b FROM (
                SELECT weight, l,
                       unnest(generate_series(1, len(l) - 1)) AS g
                FROM l{i} WHERE len(l) >= 2
            )
        ) GROUP BY a, b
    ),
    m{i} AS (
        SELECT a, b FROM p{i} WHERE cnt >= 2
        ORDER BY cnt DESC, a, b LIMIT 1
    ),
    v{i} AS (
        SELECT v.word, v.weight,
               replace(v.s, {_BPE_SEP}||m.a||{_BPE_SEP2}||m.b||{_BPE_SEP},
                       {_BPE_SEP}||m.a||m.b||{_BPE_SEP}) AS s
        FROM v{i - 1} v CROSS JOIN m{i} m
    )""")
    union = "\n    UNION ALL ".join(
        f"SELECT {i} AS step, a, b FROM m{i}"
        for i in range(1, num_merges + 1)
    )
    return head + "".join(steps) + f"""
    SELECT step, a, b FROM ({union}) ORDER BY step"""


BPE_TRAIN_ORACLE = _bpe_train_oracle(6)


# ROTATED IN r11 (seventh wave): the full 6-round training loop, unrolled.
@register("bpe_train", BPE_TRAIN_ORACLE)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import bpe as BPE

    words = BPE.word_freqs(load(spark, sf_dir, "documents"))
    merges, _ = BPE.bpe_train(words, num_merges=6, min_freq=2)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "step INT, a STRING, b STRING",
    ).orderBy("step")


# ROTATION-READY (staged for the 7th wave, r11, with the BPE twins):
# SimHash — the one dedup-family operator never driver-exposed. Bit i is
# the sign of the count-weighted +/-1 parity of md5-hex nibble i per
# token; integer arithmetic end to end, so the 16-bit signature is
# engine-exact (ties resolve to bit 1 via >= 0 on an integer sum).
SIMHASH_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
    h AS (SELECT doc_id, c, md5(t) AS h FROM cnt),
    s AS (
        SELECT doc_id,
               {sums}
        FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({bits_expr} AS BIGINT) AS simhash
    FROM s ORDER BY doc_id
    """.format(
    sums=",\n               ".join(
        f"sum(c * (2 * (CAST(('0x' || substring(h, {i}, 1)) AS BIGINT) % 2)"
        f" - 1)) AS s{i}"
        for i in range(1, 17)
    ),
    bits_expr=" + ".join(
        f"(CASE WHEN s{i} >= 0 THEN {2 ** (i - 1)} ELSE 0 END)"
        for i in range(1, 17)
    ),
)


@register("simhash", SIMHASH_ORACLE)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import dedup as DD2

    return DD2.simhash(load(spark, sf_dir, "documents"))


# ROTATION-READY (staged for the 7th wave, r11): sequence packing. The
# Spark side computes the global running token total with the
# distributed two-phase prefix sum (bucket by md5-key prefix ->
# parallel per-bucket cumsum -> O(n_buckets) driver exclusive scan);
# the oracle is the NAIVE form — one global ORDER BY window — so the
# twin PROVES the scan decomposition equals the straight SQL semantics
# row for row. n_buckets invariance is separately pinned in
# tests/test_pipeline.py.
PACK_SHARDS_ORACLE = """
    WITH b AS (
        SELECT doc_id,
               md5('pack:' || CAST(doc_id AS VARCHAR)) AS key,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    r AS (
        SELECT doc_id, n_tok,
               sum(n_tok) OVER (
                   ORDER BY key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tok AS start_offset
        FROM b
    )
    SELECT doc_id, n_tok,
           CAST(start_offset // 4096 AS BIGINT) AS shard_id,
           CAST(start_offset AS BIGINT) AS start_offset
    FROM r ORDER BY doc_id
    """


@register("pack_shards", PACK_SHARDS_ORACLE)
def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import pipeline as PL2

    return PL2.pack_shards(load(spark, sf_dir, "documents"))


# ROTATION-READY (staged for the 7th wave, r11): URL-level crawl dedup.
# Raw URLs are constructed deterministically from documents (the
# multimodal_features derive-from-table pattern) with every
# canonicalization hazard present — uppercase scheme/host, www., :443,
# tracking params out of order, fragment, trailing slash — and the
# oracle replicates the canonicalization STEPS (same regexes, list
# lambda filter, byte-order sort), not the precomputed answer.
URL_DEDUP_ORACLE = r"""
    WITH u AS (
        SELECT doc_id,
               'HTTPS://WWW.' || source || '.example.com:443/Docs/'
                   || CAST(doc_id % 5 AS VARCHAR)
                   || '/?utm_campaign=c&ref=r&page='
                   || CAST(doc_id % 3 AS VARCHAR) || '&b=2#frag' AS uri
        FROM documents
    ),
    parts AS (
        SELECT doc_id,
            lower(regexp_extract(uri, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                AS scheme,
            lower(regexp_extract(uri,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
            regexp_extract(uri,
                '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
            regexp_extract(uri, '^[^#?]*\?([^#]*)', 1) AS query0
        FROM u
    ),
    canon AS (
        SELECT doc_id,
            scheme || '://'
            || CASE
                 WHEN scheme = 'http' THEN
                     regexp_replace(regexp_replace(auth, '^www\.', ''),
                                    ':80$', '')
                 WHEN scheme = 'https' THEN
                     regexp_replace(regexp_replace(auth, '^www\.', ''),
                                    ':443$', '')
                 ELSE regexp_replace(auth, '^www\.', '')
               END
            || regexp_replace(path0, '/$', '')
            || CASE WHEN kept = '' THEN '' ELSE '?' || kept END
                AS canonical_url
        FROM (
            SELECT doc_id, scheme, auth, path0,
                array_to_string(list_sort(list_filter(
                    string_split(query0, '&'),
                    x -> x != '' AND NOT regexp_matches(x,
                        '^(utm_[^=&]*|fbclid|gclid|msclkid|igshid|ref)(=.*)?$')
                )), '&') AS kept
            FROM parts
        )
    )
    SELECT min(doc_id) AS doc_id, canonical_url,
           count(*) AS n_variants
    FROM canon GROUP BY canonical_url ORDER BY doc_id
    """


@register("url_dedup", URL_DEDUP_ORACLE)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import pipeline as PL3

    docs = load(spark, sf_dir, "documents")
    uri = F.concat(
        F.lit("HTTPS://WWW."), F.col("source"),
        F.lit(".example.com:443/Docs/"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("/?utm_campaign=c&ref=r&page="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("&b=2#frag"),
    )
    # ordered=True is oracle-presentation only (ORDER BY doc_id twin);
    # composed pipeline use keeps the default unordered plan
    return PL3.url_dedup(
        docs.select("doc_id", uri.alias("uri")), ordered=True
    )


# ---------------------------------------------------------------------------
# Staged-twin bank for the 8th rotation (r11, VERDICT r10 #7): three more
# value-exact DuckDB twins sit rotation-ready — pytest-pinned at both test
# SFs (tests/test_staged_twins.py) until they enter the window.
# ---------------------------------------------------------------------------

# Overlapping token-window chunking (pipeline.py:chunk_documents): window
# arithmetic (ceil stride count, least-bounded tail) and the 1-based
# inclusive array slice replicated step for step; chunk_text compared as
# full strings.
CHUNK_DOCUMENTS_ORACLE = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    n AS (SELECT doc_id, toks, len(toks) AS n_toks FROM t),
    c AS (
        SELECT doc_id, toks, n_toks,
               unnest(generate_series(
                   0,
                   greatest(1, CAST(ceil((n_toks - 64) / 48.0) AS INT) + 1) - 1
               )) AS chunk_id
        FROM n
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(chunk_id * 48 AS INT) AS start_tok,
           CAST(least(64, n_toks - chunk_id * 48) AS INT) AS n_chunk_tokens,
           array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
               AS chunk_text
    FROM c ORDER BY doc_id, chunk_id
    """


@register("chunk_documents", CHUNK_DOCUMENTS_ORACLE)  # rotated IN r12
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import pipeline as PL4

    return PL4.chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    ).orderBy("doc_id", "chunk_id")


# Train->test contamination report (pipeline.py:contamination_report):
# the oracle joins on the shingle STRING where the engine joins on
# md5(shingle) — identical counts absent a digest collision (the same
# equivalence every md5-keyed twin in this file rests on); the md5 split
# buckets replicate split_assign's.
CONTAMINATION_ORACLE = f"""
    WITH {{ctes}},
    b AS (
        SELECT doc_id, s,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 100 AS bk
        FROM sh
    ),
    train AS (SELECT doc_id AS train_doc, s FROM b WHERE bk < 80),
    test AS (SELECT doc_id AS test_doc_id, s FROM b WHERE bk >= 90)
    SELECT test_doc_id,
           count(DISTINCT s) AS n_shared_shingles,
           count(DISTINCT train_doc) AS n_train_docs
    FROM test JOIN train USING (s)
    GROUP BY test_doc_id ORDER BY test_doc_id
    """.format(ctes=_SHINGLE_CTES)


@register("contamination_report", CONTAMINATION_ORACLE)  # rotated IN r12
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import pipeline as PL5

    return PL5.contamination_report(load(spark, sf_dir, "documents"))


# HyperLogLog register table over the distinct-token domain
# (sketches.py:hll_register_table_portable): md5('hll:'||token), register
# = first 3 hex digits (p=12), rank = 53 - bit_length(next 52 bits) —
# exact integer arithmetic end to end (bit_length via the base-2 string,
# never float log), so every one of the <= 4096 register rows is
# engine-exact. The sketch FAMILY got its first driver rows in r10
# (KMV, CMS); this stages the third classic sketch.
TOKEN_HLL_ORACLE = """
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    h AS (SELECT md5('hll:' || t) AS h FROM tok),
    r AS (
        SELECT ('0x' || substring(h, 1, 3))::BIGINT AS reg,
               ('0x' || substring(h, 4, 13))::BIGINT AS rest
        FROM h
    )
    SELECT CAST(reg AS INT) AS reg,
           CAST(max(CASE WHEN rest > 0
                         THEN 53 - length(ltrim(bin(rest), '0'))
                         ELSE 53 END) AS INT) AS max_rank
    FROM r GROUP BY reg ORDER BY reg
    """


@register("token_hll", TOKEN_HLL_ORACLE)  # rotated IN r12
def q_token_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.functions.texthash import tokens as _toks
    from compute_histogram_spark.operators import sketches as SK2

    t = load(spark, sf_dir, "documents").select(
        F.explode(_toks("text")).alias("t")
    )
    return SK2.hll_register_table_portable(t, "t", p=12).orderBy("reg")


# TPC-H Q10 shape (relational.py:returned_item_customers) — value-pinned
# in tests since r1 but never driver-exposed; staged r11. Cents-exact
# revenue arithmetic matches every other money twin in this file; the
# top-k tie-break is (revenue DESC, c_custkey ASC), deterministic.
RETURNED_ITEM_CUSTOMERS_ORACLE = """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.returned_item_customers(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
    )


# Order-insensitive corpus checksum (pipeline.py:corpus_checksum) — the
# migration-validation primitive is portable BY CONSTRUCTION (md5-derived
# 24-bit integers summed exactly in int64), so the twin is a one-liner.
CORPUS_CHECKSUM_ORACLE = """
    SELECT count(*) AS n_docs,
           CAST(sum(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 6
           ))::BIGINT) AS BIGINT) AS checksum
    FROM documents
    """


def q_corpus_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import pipeline as PL6

    return PL6.corpus_checksum(load(spark, sf_dir, "documents"))


# fastText-style hashed linear scorer (operators/classify.py) — the
# model-based filter stage every production web pipeline runs (CCNet/
# FineWeb). The oracle rebuilds the deterministic demo weight table,
# replicates the md5 feature hashing (unigrams + space-joined bigrams)
# and the EXACT integer milli-weight accumulation; float enters only at
# the final division + sigmoid, rounded to 6 on both sides (the
# doc_perplexity precedent). Staged rotation-ready (r11).
QUALITY_MODEL_SCORE_ORACLE = """
    WITH w AS (
        SELECT CAST(id AS INT) AS bucket,
               CAST((id * 2654435761 + 40503) % 1000 - 500 AS BIGINT)
                   AS w_milli
        FROM range(4096) t(id)
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (SELECT doc_id, unnest(t) AS f FROM toks),
    bi AS (
        SELECT doc_id, t[i] || ' ' || t[i + 1] AS f
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2
        )
    ),
    feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    b AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5('ft:' || f), 1, 8))::BIGINT
                    % 4096 AS INT) AS bucket
        FROM feats
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_features,
               sum(w_milli) AS sum_w
        FROM b JOIN w USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_features AS BIGINT) AS n_features,
           round(sum_w / n_features, 6) AS logit_milli,
           round(1.0 / (1.0 + exp(-(sum_w / n_features) / 1000.0)), 6)
               AS score
    FROM agg ORDER BY doc_id
    """


@register("quality_model_score", QUALITY_MODEL_SCORE_ORACLE)  # rotated IN r12
def q_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import classify as CLS

    return CLS.linear_text_score(
        load(spark, sf_dir, "documents"), CLS.demo_weights(spark),
        ordered=True,  # presentation sort for the oracle compare only
    )


# Z-order (Morton) clustering key (sources/zorder.py:zorder_key) — the
# layout family's staged twin: the oracle rebuilds the identical
# 32-term shift/mask/or interleave over bounded integer inputs derived
# from events (user_id and cents(value), both pmod-folded to 16 bits),
# so every key is engine-exact integer arithmetic. The layout's
# data-skipping property is separately MEASURED from written row-group
# stats in tests/test_zorder.py.
def _zorder_oracle() -> str:
    terms = []
    for j, col in enumerate(("u", "v")):
        for i in range(16):
            terms.append(f"((({col} >> {i}) & 1) << {i * 2 + j})")
    expr = " | ".join(terms)
    return f"""
    WITH b AS (
        SELECT event_id,
               user_id % 65536 AS u,
               ((CAST(round(value * 100) AS BIGINT) % 65536) + 65536)
                   % 65536 AS v
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    )
    SELECT event_id, CAST({expr} AS BIGINT) AS zkey
    FROM b ORDER BY event_id
    """


ZORDER_KEY_ORACLE = _zorder_oracle()


@register("zorder_key", ZORDER_KEY_ORACLE)  # rotated IN r12
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators.relational import cents
    from compute_histogram_spark.sources.zorder import zorder_key

    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    b = ev.where(v.isNotNull() & ~F.isnan(v)).select(
        "event_id",
        (F.col("user_id") % 65536).alias("u"),
        F.pmod(cents("value"), F.lit(65536)).cast("bigint").alias("v"),
    )
    return b.select(
        "event_id", zorder_key(["u", "v"], 16).alias("zkey")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Staged-twin bank refill for the 9th rotation (r12): three NEW operators
# with value-exact DuckDB twins, pytest-pinned in tests/test_staged_twins.py
# until they enter the window (joining the two r11 spares
# returned_item_customers / corpus_checksum -> bank of five).
# ---------------------------------------------------------------------------

# Per-language token-distribution entropy (operators/text.py:
# token_entropy_per_lang) — H = ln(N) - sum(c ln c)/N over (lang, token)
# counts; the only floats are ln() terms and the final round-6 (the
# doc_perplexity float-determinism precedent).
TOKEN_ENTROPY_ORACLE = """
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    c AS (SELECT lang, t, count(*) AS c FROM tok GROUP BY lang, t)
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
    FROM c GROUP BY lang ORDER BY lang
    """


@register("token_entropy", TOKEN_ENTROPY_ORACLE)  # rotated IN r16 (12th wave)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.token_entropy_per_lang(load(spark, sf_dir, "documents"))


# C4-style normalized-text dedup (operators/dedup.py:normalized_dedup) —
# lower + [^a-z0-9 ] strip + whitespace collapse use only simple regex
# character classes, semantics identical in Java regex and DuckDB RE2;
# the oracle groups by the normalized STRING where the engine groups by
# sha2(normalized) — identical keep decisions absent a digest collision
# (the same equivalence every digest-keyed twin in this file rests on).
NORMALIZED_DEDUP_ORACLE = """
    WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(
                   lower(text), '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g'))
                   AS nt
        FROM documents
    )
    SELECT min(doc_id) AS doc_id,
           count(*) AS n_copies,
           CAST(any_value(length(nt)) AS BIGINT) AS n_norm_chars
    FROM n GROUP BY nt ORDER BY doc_id
    """


@register("normalized_dedup", NORMALIZED_DEDUP_ORACLE)  # rotated IN r16
def q_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.normalized_dedup(load(spark, sf_dir, "documents"))


# Smoothed-IDF top terms (operators/text.py:idf_top_terms) — DISTINCT
# (doc, token) then token-keyed count; idf = ln(N/df) is one ln per
# output row (no float sums at all); top-k is deterministic on
# (df DESC, token ASC) and compiles to TakeOrderedAndProject.
IDF_TOP_TERMS_ORACLE = """
    WITH tok AS (
        SELECT DISTINCT doc_id, t FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        )
    ),
    d AS (SELECT t AS token, count(*) AS df FROM tok GROUP BY t),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT token, CAST(df AS BIGINT) AS df,
           round(ln(n * 1.0 / df), 6) AS idf
    FROM d, n
    ORDER BY df DESC, token
    LIMIT 25
    """


def q_idf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.idf_top_terms(load(spark, sf_dir, "documents"))


# Cross-document duplicate-span removal (operators/dedup.py:
# duplicate_span_removal — the Lee et al. 2022 ExactSubstr dedup,
# fingerprint-shaped; staged r12, joins the 9th-rotation bank). The
# oracle keys the dup decision on the window STRING where the engine
# keys on md5(window) — identical decisions absent a digest collision
# (the standing digest-twin equivalence); reassembly is string_agg
# ORDER BY position vs sort_array(collect_list(struct)).
DUP_SPAN_ORACLE = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    w AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i + 1 : i + 16], ' ') AS w
        FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 16)) AS i
            FROM t WHERE len(toks) >= 16
        )
    ),
    dup AS (SELECT w FROM w GROUP BY w HAVING count(*) >= 2),
    cov AS (
        SELECT DISTINCT doc_id, pos + u AS p
        FROM w JOIN dup USING (w),
             (SELECT unnest(generate_series(0, 15)) AS u)
    ),
    tok AS (
        SELECT doc_id, unnest(toks) AS tok,
               unnest(generate_series(0, len(toks) - 1)) AS p
        FROM t
    ),
    kept AS (
        SELECT tok.doc_id, tok.p, tok.tok
        FROM tok LEFT JOIN cov
          ON tok.doc_id = cov.doc_id AND tok.p = cov.p
        WHERE cov.p IS NULL
    ),
    n AS (SELECT doc_id, len(toks) AS n_tokens FROM t)
    SELECT k.doc_id,
           string_agg(k.tok, ' ' ORDER BY k.p) AS text,
           CAST(any_value(n.n_tokens) AS BIGINT) AS n_tokens,
           CAST(any_value(n.n_tokens) - count(*) AS BIGINT) AS n_removed
    FROM kept k JOIN n ON k.doc_id = n.doc_id
    GROUP BY k.doc_id ORDER BY k.doc_id
    """


@register("dup_span_removal", DUP_SPAN_ORACLE)  # rotated IN r13 (9th wave)
def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.duplicate_span_removal(load(spark, sf_dir, "documents"))


# Bloom-filter word table over the token domain (operators/sketches.py:
# bloom_word_table_portable — the fourth classic sketch, staged r12).
# Exact integer arithmetic end to end: md5-derived positions, shifted
# bits OR-folded per 64-bit word; <= m/64 engine-exact rows.
TOKEN_BLOOM_ORACLE = """
    WITH tok AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    bits AS (
        -- DuckDB raises on the signed 1<<63; Spark wraps. Pin bit 63 to
        -- its two's-complement value explicitly so both engines agree.
        SELECT CAST(pos // 64 AS INT) AS word_idx,
               CASE WHEN pos % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                    ELSE (CAST(1 AS BIGINT) << CAST(pos % 64 AS INT)) END AS bit
        FROM (
            SELECT ('0x' || substring(md5('bf' || i || ':' || t), 1, 8))
                       ::BIGINT % 4096 AS pos
            FROM tok, (SELECT unnest(generate_series(0, 3)) AS i)
        )
    )
    SELECT word_idx, CAST(bit_or(bit) AS BIGINT) AS word
    FROM bits GROUP BY word_idx ORDER BY word_idx
    """


@register("token_bloom", TOKEN_BLOOM_ORACLE)  # rotated IN r16 (12th wave)
def q_token_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.functions.texthash import tokens as _tk
    from compute_histogram_spark.operators import sketches as SK3

    t = (
        load(spark, sf_dir, "documents")
        .select(F.explode(_tk("text")).alias("t"))
        .distinct()
    )
    return SK3.bloom_word_table_portable(t, "t", m_bits=4096, k=4).orderBy(
        "word_idx"
    )


# DSIR importance log-weights (operators/classify.py:dsir_log_weights —
# Data Selection with Importance Resampling, Xie et al. 2023; staged
# r12). Target = the lang='en' slice, source = the whole corpus. The
# oracle rebuilds the md5 feature hashing, the add-1-smoothed per-bucket
# log-likelihood ratios quantized to integer micro-nats (float enters
# only at ln(), the doc_perplexity round precedent), and the exact
# int64 per-doc sums.
DSIR_WEIGHTS_ORACLE = """
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    uni AS (SELECT doc_id, lang, unnest(t) AS f FROM toks),
    bi AS (
        SELECT doc_id, lang, t[i] || ' ' || t[i + 1] AS f
        FROM (
            SELECT doc_id, lang, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2
        )
    ),
    feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substring(md5('ft:' || f), 1, 8))::BIGINT
                    % 4096 AS INT) AS bucket
        FROM feats
    ),
    tc AS (SELECT bucket, count(*) AS ct FROM b WHERE lang = 'en'
           GROUP BY bucket),
    sc AS (SELECT bucket, count(*) AS cs FROM b GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM b WHERE lang = 'en') AS nt,
                   (SELECT count(*) FROM b) AS ns),
    g AS (SELECT unnest(generate_series(0, 4095)) AS bucket),
    llr AS (
        SELECT g.bucket,
               CAST(round((
                   ln((coalesce(tc.ct, 0) + 1.0) / (tot.nt + 4096))
                   - ln((coalesce(sc.cs, 0) + 1.0) / (tot.ns + 4096))
               ) * 1e6) AS BIGINT) AS llr_micro
        FROM g CROSS JOIN tot
        LEFT JOIN tc ON g.bucket = tc.bucket
        LEFT JOIN sc ON g.bucket = sc.bucket
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_features,
           CAST(sum(llr.llr_micro) AS BIGINT) AS logw_micro
    FROM b JOIN llr ON b.bucket = llr.bucket
    GROUP BY b.doc_id ORDER BY b.doc_id
    """


@register("dsir_weights", DSIR_WEIGHTS_ORACLE)  # rotated IN r13 (9th wave)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import classify as CLS2

    docs = load(spark, sf_dir, "documents")
    llr = CLS2.dsir_bucket_llr(docs.where(F.col("lang") == "en"), docs)
    from compute_histogram_spark.session import defer_release

    # carry llr's bounded-cache release tag onto the returned frame
    return defer_release(
        CLS2.dsir_log_weights(docs, llr).orderBy("doc_id"),
        *getattr(llr, "_graft_persists", ()),
    )


# Classifier PR sweep (operators/classify.py:classifier_pr_curve —
# staged r12): the demo-weight scorer evaluated against a deterministic
# text-derived label (docs whose text contains 'join'), thresholds
# 0.0..0.9. Exact integer counts; ratios are two-integer divisions
# rounded 6 on both sides.
PR_CURVE_ORACLE = """
    WITH w AS (
        SELECT CAST(id AS INT) AS bucket,
               CAST((id * 2654435761 + 40503) % 1000 - 500 AS BIGINT)
                   AS w_milli
        FROM range(4096) t(id)
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (SELECT doc_id, unnest(t) AS f FROM toks),
    bi AS (
        SELECT doc_id, t[i] || ' ' || t[i + 1] AS f
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2
        )
    ),
    feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    b AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5('ft:' || f), 1, 8))::BIGINT
                    % 4096 AS INT) AS bucket
        FROM feats
    ),
    s AS (
        SELECT doc_id,
               round(1.0 / (1.0 + exp(-(sum(w_milli) * 1.0 / count(*))
                                      / 1000.0)), 6) AS score
        FROM b JOIN w USING (bucket) GROUP BY doc_id
    ),
    y AS (
        SELECT doc_id,
               CASE WHEN len(list_filter(string_split(text, ' '),
                                         x -> x = 'join')) > 0
                    THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    sy AS (SELECT s.score AS sc, y.y FROM s JOIN y USING (doc_id)),
    th AS (SELECT id * 1.0 / 10 AS threshold FROM range(10) t(id)),
    agg AS (
        SELECT threshold,
               CAST(sum(CASE WHEN sc >= threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pred_pos,
               CAST(sum(CASE WHEN sc >= threshold AND y = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pos,
               sum(y) AS n_pos
        FROM sy, th GROUP BY threshold
    )
    SELECT round(threshold, 6) AS threshold, n_pred_pos, n_true_pos,
           round(n_true_pos * 1.0 / n_pred_pos, 6) AS precision,
           round(n_true_pos * 1.0 / n_pos, 6) AS recall,
           round(2 * (n_true_pos * 1.0 / n_pred_pos)
                   * (n_true_pos * 1.0 / n_pos)
                 / ((n_true_pos * 1.0 / n_pred_pos)
                    + (n_true_pos * 1.0 / n_pos)), 6) AS f1
    FROM agg ORDER BY threshold
    """


@register("pr_curve", PR_CURVE_ORACLE)  # rotated IN r13 (9th wave)
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import classify as CLS3

    docs = load(spark, sf_dir, "documents")
    scored = CLS3.linear_text_score(docs, CLS3.demo_weights(spark)).join(
        docs.select(
            "doc_id",
            F.array_contains(F.split("text", " "), "join")
            .cast("int").alias("label"),
        ),
        "doc_id",
    )
    return CLS3.classifier_pr_curve(scored)


# TPC-H Q18 shape (relational.py:large_volume_customers — staged r12).
# min_qty tuned to the test-data quantity distribution (99 orders clear
# 200 at sf0.001, 874 at sf0.01) so the HAVING survives both SFs.
LARGE_VOLUME_ORACLE = """
    WITH big AS (
        SELECT l_orderkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_c
        FROM lineitem GROUP BY l_orderkey
        HAVING qty_c > 20000
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(round(o.o_totalprice * 100) AS BIGINT) / 100.0
               AS o_totalprice,
           qty_c / 100.0 AS total_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 10
    """


@register("large_volume_customers", LARGE_VOLUME_ORACLE)  # IN r13 (9th wave)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.large_volume_customers(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        min_qty=200,
    )


# Triangle count of the MinHash near-dup candidate graph (graph.py:
# triangle_count — staged r12): the engine runs the degree-oriented
# node-iterator (out-degree bounded by O(sqrt(E)), hub-safe); the count
# is orientation-invariant, so the twin recomputes it from the naive
# a<b<c closure over the SAME pair set the dedup_minhash oracle derives.
TRIANGLE_ORACLE = f"""
    WITH {_minhash_pairs_ctes()}
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM pairs e1
    JOIN pairs e2 ON e1.doc_id_2 = e2.doc_id_1
    JOIN pairs e3 ON e3.doc_id_1 = e1.doc_id_1
                 AND e3.doc_id_2 = e2.doc_id_2
    """


@register("dedup_triangles", TRIANGLE_ORACLE)  # rotated IN r16 (12th wave)
def q_dedup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import graph as G2

    pairs = DD.minhash_candidates(load(spark, sf_dir, "documents"))
    return G2.triangle_count(pairs, src="doc_id_1", dst="doc_id_2")


# TPC-H Q21 shape (relational.py:waiting_suppliers — staged r12): the
# EXISTS / NOT EXISTS pair as two orderkey aggregations (sole late
# supplier on a multi-supplier order); late = shipdate > orderdate,
# the schema's late_order_priority convention.
WAITING_SUPPLIERS_ORACLE = """
    WITH lo AS (
        SELECT l.l_orderkey, l.l_suppkey,
               max(l.l_shipdate) AS ms, max(o.o_orderdate) AS od
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    os AS (
        SELECT l_orderkey, count(*) AS n_supp,
               sum(CASE WHEN ms > od THEN 1 ELSE 0 END) AS n_late
        FROM lo GROUP BY 1
    ),
    qual AS (
        SELECT lo.l_suppkey
        FROM lo JOIN os USING (l_orderkey)
        WHERE lo.ms > lo.od AND os.n_supp >= 2 AND os.n_late = 1
    ),
    c AS (
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
        FROM qual GROUP BY 1
    )
    SELECT s.s_name, c.numwait
    FROM c JOIN supplier s ON c.l_suppkey = s.s_suppkey
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """


@register("waiting_suppliers", WAITING_SUPPLIERS_ORACLE)  # rotated IN r15 (11th wave)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.waiting_suppliers(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "supplier"),
    )


# Heaps-law vocabulary growth (operators/text.py:vocab_growth — staged
# r12): exact integer curve (a token joins the vocabulary at its min
# doc_id), cumulative windows over the doc-bounded checkpoint table.
VOCAB_GROWTH_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    per_doc AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
    first AS (
        SELECT doc_id, count(*) AS n_new FROM (
            SELECT t, min(doc_id) AS doc_id FROM tok GROUP BY t
        ) GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(sum(p.n_tok) OVER w AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(f.n_new, 0)) OVER w AS BIGINT) AS vocab_size
    FROM per_doc p LEFT JOIN first f ON p.doc_id = f.doc_id
    WINDOW w AS (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING)
    ORDER BY p.doc_id
    """


@register("vocab_growth", VOCAB_GROWTH_ORACLE)  # rotated IN r13 (9th wave)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.vocab_growth(load(spark, sf_dir, "documents"))


# TPC-H Q13 shape (relational.py:customer_order_distribution — staged
# r12): the outer-join coverage row — zero-order customers must appear
# as the c_count=0 bucket.
CUSTOMER_ORDER_DIST_ORACLE = """
    WITH per AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           count(*) AS custdist
    FROM per GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """


@register("customer_order_distribution", CUSTOMER_ORDER_DIST_ORACLE)  # rotated IN r15 (11th wave)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customer_order_distribution(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    )


# ---------------------------------------------------------------------------
# r12 continuation: the TPC-H completion sweep. Nine query shapes already
# ship (Q1/Q3/Q4/Q5/Q10/Q13/Q14/Q18/Q21); the remaining thirteen land
# here, adapted to the testdata schema (no partsupp table; no
# shipmode/commit/receipt/phone columns) with the STRUCTURAL obligations
# preserved — each docstring in relational.py names what survived the
# adaptation. All staged for future rotation waves, pinned at both SFs
# in tests/test_staged_twins.py.

# TPC-H Q6 shape (relational.py:forecast_revenue — staged r12): the
# pure filter-agg row; the twin's discount band compares integer cents
# on both engines (raw doubles drop the 0.07 edge differently).
FORECAST_REVENUE_ORACLE = """
    SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0
               AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.forecast_revenue(load(spark, sf_dir, "lineitem"))


# TPC-H Q12 shape (relational.py:latency_mode_priority — staged r12):
# derived SLOW/FAST shipping class (no l_shipmode in the schema),
# CASE-inside-SUM priority split.
LATENCY_MODE_ORACLE = """
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 75
                THEN 'SLOW' ELSE 'FAST' END AS ship_class,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """


def q_latency_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.latency_mode_priority(
        load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    )


# TPC-H Q19 shape (relational.py:disjunctive_band_revenue — staged
# r12): the disjunctive-pushdown row; the SQL unrolls the same
# Q19_BANDS module constant the Spark plan consumes.
_Q19_DISJUNCTS = " OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
    f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in R.Q19_BANDS
)
DISJUNCTIVE_BAND_ORACLE = f"""
    SELECT sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
               / 10000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {_Q19_DISJUNCTS}
    """


def q_disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.disjunctive_band_revenue(
        load(spark, sf_dir, "part"), load(spark, sf_dir, "lineitem")
    )


# TPC-H Q22 shape (relational.py:sales_opportunity — staged r12):
# scalar-subquery balance gate + anti join against recent orders +
# derived country-code group (no c_phone; every customer has SOME
# order, so the anti join correlates on orders since 2000-01-01).
SALES_OPPORTUNITY_ORACLE = """
    WITH avg_bal AS (
        SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
               / CAST(count(*) AS DOUBLE) AS avg_bal_c
        FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c.c_nationkey % 5 AS BIGINT) AS cntrycode,
           count(*) AS numcust,
           sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0
               AS totacctbal
    FROM customer c, avg_bal
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > avg_bal.avg_bal_c
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1 ORDER BY 1
    """


def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.sales_opportunity(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    )


# TPC-H Q7 shape (relational.py:volume_shipping — staged r12): bilateral
# region-pair trade volume by ship year (nation pairs are empty at
# sf0.001; regions keep the directional-pair semantics live).
VOLUME_SHIPPING_ORACLE = """
    SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
               / 10000.0 AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
           OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.volume_shipping(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    )


# TPC-H Q8 shape (relational.py:market_share — staged r12): ASIA
# suppliers' share of the EUROPE STANDARD-parts market by order year.
# Zero numerators stay exactly 0.0 (integer-sum division).
MARKET_SHARE_ORACLE = """
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           sum(CASE WHEN r1.r_name = 'ASIA'
                    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                    ELSE 0 END)
           / CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                 AS DOUBLE) AS mkt_share,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
               / 10000.0 AS total_volume
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE p.p_type = 'STANDARD' AND r2.r_name = 'EUROPE'
    GROUP BY 1 ORDER BY 1
    """


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.market_share(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "part"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    )


# TPC-H Q9 shape (relational.py:product_type_profit — staged r12):
# profit by supplier nation and order year for the 'widget' family;
# unit cost proxied by p_retailprice (no partsupp in the schema).
PRODUCT_PROFIT_ORACLE = """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               - CAST(round(p.p_retailprice * 100) AS BIGINT)
                 * CAST(round(l.l_quantity * 100) AS BIGINT))
               / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.product_type_profit(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "part"),
        load(spark, sf_dir, "nation"),
    )


# TPC-H Q15 shape (relational.py:top_supplier — staged r12): the
# max-revenue supplier(s) over 1996Q1; the winner filter compares the
# EXACT integer 1e-4-dollar revenue, never the divided double.
TOP_SUPPLIER_ORACLE = """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, rev.rev_e4 / 10000.0 AS total_revenue
    FROM rev
    JOIN supplier s ON rev.l_suppkey = s.s_suppkey
    WHERE rev.rev_e4 = (SELECT max(rev_e4) FROM rev)
    ORDER BY s.s_suppkey
    """


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_supplier(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "supplier")
    )


# TPC-H Q2 shape (relational.py:min_cost_supplier — staged r12): the
# correlated-min + join-back row; unit cost derived from observed
# trades in integer milli-dollars (floor division — engine-stable).
MIN_COST_SUPPLIER_ORACLE = """
    WITH eu AS (
        SELECT s_suppkey, s_acctbal, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cost AS (
        SELECT l.l_partkey, eu.s_suppkey, eu.s_acctbal, eu.s_name,
               eu.n_name,
               min(CAST(round(l.l_extendedprice * 100) AS BIGINT) * 10
                   // CAST(round(l.l_quantity * 100) AS BIGINT))
                   AS unit_milli
        FROM lineitem l JOIN eu ON l.l_suppkey = eu.s_suppkey
        GROUP BY 1, 2, 3, 4, 5
    ),
    best AS (
        SELECT l_partkey, min(unit_milli) AS min_milli
        FROM cost GROUP BY 1
    )
    SELECT CAST(round(c.s_acctbal * 100) AS BIGINT) / 100.0 AS s_acctbal,
           c.s_name, c.n_name, p.p_partkey, p.p_name,
           c.unit_milli / 1000.0 AS unit_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey
               AND c.unit_milli = b.min_milli
    JOIN part p ON c.l_partkey = p.p_partkey
    WHERE p.p_size < 25
    ORDER BY s_acctbal DESC, c.s_name, p.p_partkey
    """


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.min_cost_supplier(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "part"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    )


# TPC-H Q11 shape (relational.py:important_parts — staged r12): the
# HAVING-vs-global-scalar row with a SCALE-FREE threshold (share >
# 1.5x the average per-part share — Q11's 0.0001/SF fraction can't
# hold across both test SFs); pure-integer ratio comparison.
IMPORTANT_PARTS_ORACLE = """
    WITH eu AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    v AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_c
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM eu)
        GROUP BY 1
    ),
    tot AS (
        SELECT sum(value_c) AS total_c, count(*) AS n_parts FROM v
    )
    SELECT v.l_partkey, v.value_c / 100.0 AS part_value
    FROM v, tot
    WHERE v.value_c * tot.n_parts * 2 > tot.total_c * 3
    ORDER BY part_value DESC, v.l_partkey
    """


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.important_parts(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    )


# TPC-H Q16 shape (relational.py:supplier_part_counts — staged r12):
# distinct-supplier counts per part class with the brand exclusion
# pushed to the part scan and the low-balance supplier NOT-IN applied
# as an anti join before the distinct aggregation.
SUPPLIER_PART_COUNTS_ORACLE = """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.supplier_part_counts(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "part"),
    )


# TPC-H Q17 shape (relational.py:small_quantity_revenue — staged r12):
# the correlated per-part average gate, integer-exact by multiplying
# through by the group count (qty_c * 5 * n < sum_qty_c).
SMALL_QUANTITY_ORACLE = """
    WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'),
    li AS (
        SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM p)
    ),
    pa AS (
        SELECT l_partkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c,
               count(*) AS n_items
        FROM li GROUP BY 1
    )
    SELECT sum(CAST(round(li.l_extendedprice * 100) AS BIGINT))
               / 100.0 / 7.0 AS avg_yearly,
           count(*) AS n_small
    FROM li JOIN pa ON li.l_partkey = pa.l_partkey
    WHERE CAST(round(li.l_quantity * 100) AS BIGINT) * 5 * pa.n_items
          < pa.sum_qty_c
    """


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.small_quantity_revenue(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    )


# TPC-H Q20 shape (relational.py:promotion_suppliers — staged r12):
# the nested-IN pyramid as semi-joins; peer-relative overstock gate
# (q_c * n_supp > total_c * 2, integer-exact).
PROMOTION_SUPPLIERS_ORACLE = """
    WITH p AS (
        SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
    ),
    sq AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS q_c
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM p)
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    pt AS (
        SELECT l_partkey, sum(q_c) AS total_c, count(*) AS n_supp
        FROM sq GROUP BY 1
    ),
    qual AS (
        SELECT DISTINCT sq.l_suppkey
        FROM sq JOIN pt ON sq.l_partkey = pt.l_partkey
        WHERE sq.q_c * pt.n_supp > pt.total_c * 2
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM qual)
    ORDER BY s.s_suppkey
    """


def q_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.promotion_suppliers(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "part"),
    )


# ---------------------------------------------------------------------------
# r13 staged twin: a STREAMING operator under the value-exact oracle gate
# (VERDICT r12 #5). streaming_user_stats (applyInPandasWithState) drains
# through four deterministic micro-batches (streaming/stream_ops.py:
# deterministic_event_batches — fixed content via event_id % 4, fixed
# order via ascending mtimes); the converged state equals the batch
# GROUP BY because the state arithmetic is micro-batch-invariant
# (integer-cent sums; associative count/min/max) — which is what makes a
# SQL oracle possible for a stateful streaming op at all. Users with no
# valid value converge to n_events=0 and are dropped on both sides.
# ---------------------------------------------------------------------------

STREAMING_USER_STATS_ORACLE = """
    SELECT user_id,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY user_id
    ORDER BY user_id
    """


@register("streaming_user_stats", STREAMING_USER_STATS_ORACLE)
def q_streaming_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.streaming.stream_ops import (
        drained_user_stats,
    )

    return drained_user_stats(spark, sf_dir)


# ---------------------------------------------------------------------------
# r13 staged twin: the END-TO-END corpus pipeline (VERDICT r12 #6) — the
# five already-pinned stages composed as ONE lazy plan
# (pipeline.py:end_to_end_corpus): url_dedup -> exact dedup -> MinHash
# near-dup removal -> ExactSubstr span removal -> quality gate. The
# oracle chains the five stage oracles verbatim (uniquely-renamed CTEs;
# the recursive component fixpoint rides the same WITH), so a value
# mismatch localizes to composition, not stage logic. URIs are the
# deterministic synthetic crawl variants (pairs 2k/2k+1 differ only in
# tracking params -> the canonical form collapses each pair).
# ---------------------------------------------------------------------------


def _end_to_end_oracle(num_hashes: int = 8, rows_per_band: int = 2) -> str:
    mins = ",\n               ".join(
        f"min(md5('{i}:' || s)) AS mh{i}" for i in range(num_hashes)
    )
    band_selects = []
    for b in range(num_hashes // rows_per_band):
        members = " || '|' || ".join(
            f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({members}) AS band_hash"
            " FROM mh3"
        )
    bands = "\n        UNION ALL ".join(band_selects)
    return rf"""
    WITH RECURSIVE
    u AS (
        SELECT doc_id, text,
               'HTTPS://WWW.crawl.example.com:443/Docs/'
                   || CAST(doc_id // 2 AS VARCHAR)
                   || '/?utm_source=' || CAST(doc_id % 2 AS VARCHAR)
                   || '&fbclid=x#frag' AS uri
        FROM documents
    ),
    parts AS (
        SELECT doc_id,
            lower(regexp_extract(uri, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                AS scheme,
            lower(regexp_extract(uri,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
            regexp_extract(uri,
                '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
            regexp_extract(uri, '^[^#?]*\?([^#]*)', 1) AS query0
        FROM u
    ),
    canon AS (
        SELECT doc_id,
            scheme || '://'
            || CASE
                 WHEN scheme = 'http' THEN
                     regexp_replace(regexp_replace(auth, '^www\.', ''),
                                    ':80$', '')
                 WHEN scheme = 'https' THEN
                     regexp_replace(regexp_replace(auth, '^www\.', ''),
                                    ':443$', '')
                 ELSE regexp_replace(auth, '^www\.', '')
               END
            || regexp_replace(path0, '/$', '')
            || CASE WHEN kept = '' THEN '' ELSE '?' || kept END
                AS canonical_url
        FROM (
            -- coalesce: array_to_string over an EMPTY kept-list is NULL
            -- in DuckDB (all params here are tracking params; the
            -- url_dedup oracle never hit this because its page= param
            -- always survived)
            SELECT doc_id, scheme, auth, path0,
                coalesce(array_to_string(list_sort(list_filter(
                    string_split(query0, '&'),
                    x -> x != '' AND NOT regexp_matches(x,
                        '^(utm_[^=&]*|fbclid|gclid|msclkid|igshid|ref)(=.*)?$')
                )), '&'), '') AS kept
            FROM parts
        )
    ),
    k1 AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY canonical_url),
    d1 AS (SELECT u.doc_id, u.text FROM u JOIN k1 USING (doc_id)),
    k2 AS (SELECT min(doc_id) AS doc_id FROM d1 GROUP BY text),
    d2 AS (SELECT d1.doc_id, d1.text FROM d1 JOIN k2 USING (doc_id)),
    t3 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d2),
    g3 AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS g
        FROM t3
    ),
    sh3 AS (
        SELECT DISTINCT doc_id,
               concat_ws(' ', toks[g], toks[g+1], toks[g+2]) AS s
        FROM g3
    ),
    mh3 AS (
        SELECT doc_id,
               {mins}
        FROM sh3 GROUP BY doc_id
    ),
    bands3 AS (
        {bands}
    ),
    pairs3 AS (
        SELECT DISTINCT a.doc_id AS p1, b.doc_id AS p2
        FROM bands3 a
        JOIN bands3 b ON a.band_id = b.band_id
                     AND a.band_hash = b.band_hash
                     AND a.doc_id < b.doc_id
    ),
    e3 AS (
        SELECT p1 AS a, p2 AS b FROM pairs3
        UNION SELECT p2, p1 FROM pairs3
    ),
    reach3(node, r) AS (
        SELECT a, a FROM e3
        UNION
        SELECT e3.b, reach3.r FROM e3 JOIN reach3 ON e3.a = reach3.node
    ),
    comp3 AS (SELECT node, min(r) AS component FROM reach3 GROUP BY node),
    losers3 AS (SELECT node AS doc_id FROM comp3 WHERE node != component),
    d3 AS (
        SELECT doc_id, text FROM d2
        WHERE doc_id NOT IN (SELECT doc_id FROM losers3)
    ),
    t4 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d3),
    w4 AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i + 1 : i + 16], ' ') AS w
        FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 16)) AS i
            FROM t4 WHERE len(toks) >= 16
        )
    ),
    dup4 AS (SELECT w FROM w4 GROUP BY w HAVING count(*) >= 2),
    cov4 AS (
        SELECT DISTINCT doc_id, pos + uu AS p
        FROM w4 JOIN dup4 USING (w),
             (SELECT unnest(generate_series(0, 15)) AS uu)
    ),
    tok4 AS (
        SELECT doc_id, unnest(toks) AS tok,
               unnest(generate_series(0, len(toks) - 1)) AS p
        FROM t4
    ),
    kept4 AS (
        SELECT tok4.doc_id, tok4.p, tok4.tok
        FROM tok4 LEFT JOIN cov4
          ON tok4.doc_id = cov4.doc_id AND tok4.p = cov4.p
        WHERE cov4.p IS NULL
    ),
    n4 AS (SELECT doc_id, len(toks) AS n_tokens FROM t4),
    d4 AS (
        SELECT k.doc_id,
               string_agg(k.tok, ' ' ORDER BY k.p) AS text,
               CAST(any_value(n4.n_tokens) AS BIGINT) AS n_tokens,
               CAST(any_value(n4.n_tokens) - count(*) AS BIGINT)
                   AS n_removed
        FROM kept4 k JOIN n4 ON k.doc_id = n4.doc_id
        GROUP BY k.doc_id
    ),
    w5 AS (
        SELECT CAST(id AS INT) AS bucket,
               CAST((id * 2654435761 + 40503) % 1000 - 500 AS BIGINT)
                   AS w_milli
        FROM range(4096) t(id)
    ),
    t5 AS (SELECT doc_id, string_split(text, ' ') AS t FROM d4),
    uni5 AS (SELECT doc_id, unnest(t) AS f FROM t5),
    bi5 AS (
        SELECT doc_id, t[i] || ' ' || t[i + 1] AS f
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM t5 WHERE len(t) >= 2
        )
    ),
    feats5 AS (SELECT * FROM uni5 UNION ALL SELECT * FROM bi5),
    b5 AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5('ft:' || f), 1, 8))::BIGINT
                    % 4096 AS INT) AS bucket
        FROM feats5
    ),
    agg5 AS (
        SELECT doc_id, count(*) AS n_features, sum(w_milli) AS sum_w
        FROM b5 JOIN w5 USING (bucket) GROUP BY doc_id
    ),
    score5 AS (
        SELECT doc_id,
               round(1.0 / (1.0 + exp(-(sum_w / n_features) / 1000.0)), 6)
                   AS score
        FROM agg5
    )
    SELECT d4.doc_id, d4.text, d4.n_tokens, d4.n_removed
    FROM d4 JOIN score5 USING (doc_id)
    WHERE score5.score >= 0.5
    ORDER BY d4.doc_id
    """


END_TO_END_CORPUS_ORACLE = _end_to_end_oracle()


@register("end_to_end_corpus", END_TO_END_CORPUS_ORACLE)
def q_end_to_end_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import classify as CLS5
    from compute_histogram_spark.operators import pipeline as PL5

    docs = load(spark, sf_dir, "documents")
    uri = F.concat(
        F.lit("HTTPS://WWW.crawl.example.com:443/Docs/"),
        F.expr("doc_id div 2").cast("string"),
        F.lit("/?utm_source="),
        (F.col("doc_id") % 2).cast("string"),
        F.lit("&fbclid=x#frag"),
    )
    out = PL5.end_to_end_corpus(
        docs.select("doc_id", "text", uri.alias("uri")),
        CLS5.demo_weights(spark),
    )
    from compute_histogram_spark.session import defer_release

    # propagate the stage-boundary release tag through the orderBy
    return defer_release(
        out.orderBy("doc_id"), *getattr(out, "_graft_persists", ())
    )


# ---------------------------------------------------------------------------
# r13 additions: two new LLM-pipeline operators, staged for rotation wave 10.

# C4-style blocklist gate (text.py:blocklist_signals — staged r13): per-doc
# blocked-token fraction + pass flag, all in the scan stage.
BLOCKLIST_ORACLE = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_filter(toks,
                   x -> x IN ('slow', 'drop', 'stale'))) AS n_blocked
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_blocked AS BIGINT) AS n_blocked,
           CASE WHEN n_tokens > 0
                THEN round(n_blocked * 1.0 / n_tokens, 6)
                ELSE 0.0 END AS blocked_frac,
           CASE WHEN n_tokens > 0
                THEN round(n_blocked * 1.0 / n_tokens, 6)
                ELSE 0.0 END <= 0.05 AS blocklist_pass
    FROM s ORDER BY doc_id
    """


@register("blocklist_signals", BLOCKLIST_ORACLE)
def q_blocklist_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import text as TXB

    return TXB.blocklist_signals(load(spark, sf_dir, "documents"))


# One-pass distributed covariance of the embedding column
# (clustering.py:embedding_moments — staged r13): the moments stage of PCA
# whitening; d(d+1)/2 upper-triangle rows, shuffle O(partitions x d^2).
# Engine-EXACT form (VERDICT r14 #1): both engines quantize each float32
# coordinate once with the identical expression floor(x*1e7 + 0.5) to
# int64, accumulate exact integer moments (DuckDB sum(BIGINT) -> HUGEINT,
# Spark int64 GEMM partials), build the numerator sxy*n - sx*sy in exact
# wide-integer arithmetic, and perform ONE double division — identical
# integers in, identical double out, under any partition layout.
EMBEDDING_COVARIANCE_ORACLE = """
    WITH u AS (
        SELECT vec_id, g - 1 AS k,
               CAST(floor(CAST(embedding[g] AS DOUBLE) * 10000000 + 0.5)
                    AS BIGINT) AS q
        FROM (
            SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS g
            FROM embeddings
        )
    ),
    p AS (
        SELECT a.k AS i, b.k AS j, sum(a.q * b.q) AS sxy
        FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.k <= b.k
        GROUP BY 1, 2
    ),
    m AS (SELECT k, sum(q) AS sx FROM u GROUP BY k),
    c AS (SELECT count(*) AS n FROM embeddings)
    SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j, c.n AS n,
           -- "+ 0" canonicalizes IEEE signed zero: DuckDB round() returns
           -- -0.0 for tiny negatives, Spark's BigDecimal round cannot
           -- represent it and returns +0.0; the driver value-hash
           -- distinguishes the two (VERDICT r15 #1).
           round(CAST(p.sxy * c.n - mi.sx * mj.sx AS DOUBLE)
                 / (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE) * 1e14),
                 6) + 0 AS cov
    FROM p, c
    JOIN m mi ON mi.k = p.i
    JOIN m mj ON mj.k = p.j
    ORDER BY i, j
    """


@register("embedding_covariance", EMBEDDING_COVARIANCE_ORACLE)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import clustering as CLM

    return CLM.embedding_moments(load(spark, sf_dir, "embeddings"))


# PCA ANN tier, PERSISTED serving path (staged r14, VERDICT r13 #6): the
# index is written once (idempotent per sf_dir) and queries run zero
# training passes — no moments scan, no eigh, no projection. At dim == d
# the orthonormal rotation preserves every cosine, so the served result
# is value-identical to the exact tier and SHARES its oracle (the
# SIMILARITY_GEMM_ORACLE precedent); truncated-dim recall floors stay
# pinned in tests/test_clustering.py.
SIMILARITY_PCA_INDEX_ORACLE = SIMILARITY_TOPK_ORACLE


@register("similarity_topk_pca_index", SIMILARITY_PCA_INDEX_ORACLE)  # IN r16
def q_similarity_topk_pca_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib as _hl
    import os

    from compute_histogram_spark.operators import clustering as CLM

    emb = load(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()["embedding"])
    path = "/tmp/pca_idx_" + _hl.md5(
        os.path.abspath(sf_dir).encode()
    ).hexdigest()[:10]
    if not os.path.exists(os.path.join(path, "vectors", "_SUCCESS")):
        CLM.write_pca_index(emb, path, dim=d)
    return CLM.cosine_topk_pca_index(spark, path, k=5)


# Second streaming-derived twin (staged r13, with streaming_user_stats):
# streaming_exact_dedup drained through the deterministic micro-batch
# harness — dropDuplicatesWithinWatermark's global first-occurrence set,
# projected to its emission-invariant pair (value, first_batch).
STREAMING_EXACT_DEDUP_ORACLE = """
    SELECT value,
           CAST(min(event_id % 4) AS INT) AS first_batch
    FROM events GROUP BY value ORDER BY value
    """


@register("streaming_exact_dedup", STREAMING_EXACT_DEDUP_ORACLE)  # rotated IN r15 (11th wave)
def q_streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.streaming import stream_ops as SO

    return SO.drained_exact_dedup(spark, sf_dir, n_batches=4)


# Third streaming-derived twin (staged r14, VERDICT r13 #7):
# streaming_distribution_drift drained through the same deterministic
# micro-batches — complete-mode cumulative PSI of the purchase stream
# against the static non-purchase reference, one report per batch.
# Every INTERMEDIATE report is oracle-checked, not just the converged
# one: report i covers the event_id % 4 <= i prefix by construction.
STREAMING_DRIFT_ORACLE = """
    WITH b AS (SELECT unnest(generate_series(0, 3)) AS batch_id),
    ref AS (
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
               count(*) AS n_ref
        FROM events
        WHERE event_type != 'purchase'
          AND value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1
    ),
    cur AS (
        SELECT b.batch_id, CAST(floor(value / 50.0) AS BIGINT) AS bin,
               count(*) AS n_cur
        FROM events, b
        WHERE event_type = 'purchase'
          AND value IS NOT NULL AND NOT isnan(value)
          AND event_id % 4 <= b.batch_id
        GROUP BY 1, 2
    ),
    bins AS (
        SELECT batch_id, bin FROM b CROSS JOIN ref
        UNION
        SELECT batch_id, bin FROM cur
    ),
    tc AS (
        SELECT b.batch_id, COALESCE(sum(c.n_cur), 0) AS t_cur
        FROM b LEFT JOIN cur c USING (batch_id) GROUP BY 1
    ),
    tr AS (SELECT COALESCE(sum(n_ref), 0) AS t_ref FROM ref),
    nb AS (SELECT batch_id, count(*) AS nb FROM bins GROUP BY 1),
    terms AS (
        SELECT bins.batch_id,
               round(((COALESCE(c.n_cur, 0) + 0.5)
                          / (tc.t_cur + 0.5 * nb.nb)
                      - (COALESCE(r.n_ref, 0) + 0.5)
                          / (tr.t_ref + 0.5 * nb.nb))
                     * ln(((COALESCE(c.n_cur, 0) + 0.5)
                               / (tc.t_cur + 0.5 * nb.nb))
                          / ((COALESCE(r.n_ref, 0) + 0.5)
                               / (tr.t_ref + 0.5 * nb.nb))), 6) AS term
        FROM bins
        LEFT JOIN cur c ON c.batch_id = bins.batch_id AND c.bin = bins.bin
        LEFT JOIN ref r ON r.bin = bins.bin
        JOIN tc ON tc.batch_id = bins.batch_id
        JOIN nb ON nb.batch_id = bins.batch_id
        CROSS JOIN tr
    )
    SELECT batch_id, round(sum(term), 6) AS psi
    FROM terms GROUP BY 1 ORDER BY 1
    """


@register("streaming_drift", STREAMING_DRIFT_ORACLE)  # rotated IN r15 (11th wave)
def q_streaming_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.streaming import stream_ops as SO

    return SO.drained_distribution_drift(spark, sf_dir, n_batches=4)


# Fourth streaming-derived twin (staged r14): streaming_normalized_dedup
# over a DOCUMENTS file stream through the drain harness — the
# ingestion-time C4 preprocessing gate under the value-exact window.
# Same emission-invariant projection as streaming_exact_dedup: every
# in-batch duplicate of a normalized digest shares its batch index, so
# (norm_hash, first_batch = doc_id % 4) is deterministic; the oracle
# groups the normalized digest to min(doc_id % 4). Normalization uses
# only simple regex character classes (Java regex == DuckDB RE2) and
# sha2-256 == DuckDB sha256 (lowercase hex both).
STREAMING_NORM_DEDUP_ORACLE = """
    WITH d AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000001, '  ' || upper(text) || ' !!'
        FROM documents
    ),
    n AS (
        SELECT doc_id % 4 AS b,
               sha256(trim(regexp_replace(regexp_replace(
                   lower(text), '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g')))
                   AS norm_hash
        FROM d
    )
    SELECT norm_hash, CAST(min(b) AS INT) AS first_batch
    FROM n GROUP BY norm_hash ORDER BY norm_hash
    """


@register("streaming_norm_dedup", STREAMING_NORM_DEDUP_ORACLE)  # rotated IN r15 (11th wave)
def q_streaming_norm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.streaming import stream_ops as SO

    return SO.drained_normalized_dedup(spark, sf_dir, n_batches=4)


# Q1 over the write-once cents PROJECTION (staged r14): identical
# aggregates on the materialized integer-cents columns — shares the
# plain form's oracle (value-identical by construction; the
# SIMILARITY_GEMM precedent of serving the fastest value-identical
# formulation under the same oracle).
PRICING_PROJECTED_ORACLE = ORACLES["pricing_summary"]


def q_pricing_summary_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import relational as RL
    from compute_histogram_spark.sources.bucketing import (
        write_pricing_projection,
    )

    path = write_pricing_projection(spark, sf_dir)
    return RL.pricing_summary_projected(spark.read.parquet(path))


# Cross-corpus overlap from mergeable KMV sketches
# (sketches.py:corpus_overlap_kmv — staged r13): Jaccard/intersection
# planning without joining the corpora; every number replicated to the
# digit by sketch algebra over the portable md5 digests. Corpus split:
# even- vs odd-numbered sources (substr int parity — engine-identical).
CORPUS_OVERLAP_KMV_ORACLE = """
    WITH d AS (
        SELECT doc_id, text,
               CAST(substring(source, 4) AS INT) % 2 AS par
        FROM documents
    ),
    toks AS (SELECT doc_id, par, string_split(text, ' ') AS toks FROM d),
    g AS (
        SELECT doc_id, par, toks,
               unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS g
        FROM toks
    ),
    sh AS (
        SELECT DISTINCT par,
               md5('kmv:' || concat_ws(' ', toks[g], toks[g+1], toks[g+2]))
                   AS h
        FROM g
    ),
    ska AS (SELECT h FROM sh WHERE par = 0 ORDER BY h LIMIT 64),
    skb AS (SELECT h FROM sh WHERE par = 1 ORDER BY h LIMIT 64),
    u AS (
        SELECT h FROM (
            SELECT DISTINCT h FROM (
                SELECT h FROM ska UNION ALL SELECT h FROM skb
            )
        ) ORDER BY h LIMIT 64
    ),
    c AS (
        SELECT count(*) AS n_common FROM u
        WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)
    ),
    a AS (SELECT max(h) AS kth_hex, count(*) AS n FROM u)
    SELECT CAST(n AS INT) AS k_used,
           CAST(n_common AS INT) AS n_common,
           CASE WHEN n > 0 THEN round(n_common * 1.0 / n, 6)
                ELSE 0.0 END AS jaccard_est,
           round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                 ELSE 63 / ((CAST(('0x' || substring(kth_hex, 1, 12))
                                  AS BIGINT) + 1) / 281474976710656.0)
                 END, 6) AS union_distinct_est,
           round(CASE WHEN n > 0 THEN round(n_common * 1.0 / n, 6)
                      ELSE 0.0 END
                 * round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                        ELSE 63 / ((CAST(('0x' || substring(kth_hex, 1, 12))
                                         AS BIGINT) + 1)
                                   / 281474976710656.0)
                        END, 6), 6) AS intersection_est
    FROM a, c
    """


@register("corpus_overlap_kmv", CORPUS_OVERLAP_KMV_ORACLE)
def q_corpus_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.operators import sketches as SKO

    docs = load(spark, sf_dir, "documents")
    par = F.substring("source", 4, 10).cast("int") % 2
    return SKO.corpus_overlap_kmv(
        docs.where(par == 0), docs.where(par == 1)
    )


# ---------------------------------------------------------------------------
# Staged-twin bank refill for the 13th rotation (r16): three NEW operators
# with value-exact DuckDB twins, pytest-pinned at both SFs in
# tests/test_staged_twins.py until they enter the 50-row window. All three
# passed the --layouts repartition(1/7/64) pre-screen and a signed-zero
# sweep (integer outputs only — no round() that can straddle a tiny
# negative) before staging.

# Cross-source NEAR-duplicate provenance matrix
# (operators/dedup.py:neardup_source_overlap — staged r16): source-pair
# counts over the SAME banded MinHash pair set the dedup_minhash oracle
# derives (never all-pairs); exact integer counts, and the (s1, s2) key is
# least/greatest-normalized so the matrix is triangular under any
# candidate-pair orientation.
NEARDUP_SOURCE_OVERLAP_ORACLE = f"""
    WITH {_minhash_pairs_ctes()},
    src AS (SELECT doc_id, source FROM documents)
    SELECT least(a.source, b.source) AS s1,
           greatest(a.source, b.source) AS s2,
           count(*) AS n_pairs
    FROM pairs p
    JOIN src a ON p.doc_id_1 = a.doc_id
    JOIN src b ON p.doc_id_2 = b.doc_id
    GROUP BY s1, s2
    ORDER BY s1, s2
    """


def q_neardup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.neardup_source_overlap(load(spark, sf_dir, "documents"))


# Top-k skip-gram co-occurrences (operators/text.py:skipgram_pairs —
# staged r16): the word2vec/GloVe context-count pass. One map-side explode
# per distance (the token_pmi index-sequence idiom, no posexplode
# self-join), exact integer counts, deterministic top-k on (n desc, a, b).
SKIPGRAM_PAIRS_ORACLE = """
    WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
    p AS (
        SELECT ts[i] AS a, ts[i + 1] AS b
        FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
              FROM t WHERE len(ts) >= 2)
        UNION ALL
        SELECT ts[i] AS a, ts[i + 2] AS b
        FROM (SELECT ts, unnest(generate_series(1, len(ts) - 2)) AS i
              FROM t WHERE len(ts) >= 3)
    )
    SELECT a, b, n_pairs FROM (
        SELECT a, b, count(*) AS n_pairs,
               row_number() OVER (ORDER BY count(*) DESC, a, b) AS rnk
        FROM p GROUP BY a, b
        HAVING count(*) >= 5
    ) WHERE rnk <= 25 ORDER BY n_pairs DESC, a, b
    """


def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.skipgram_pairs(
        load(spark, sf_dir, "documents"), window=2, min_count=5, k=25
    )


# Per-group exact length quantiles by integer rank selection
# (operators/text.py:doc_length_quantiles — staged r16): idx =
# ceil(p * n) computed as cum * den >= num * n in EXACT integer
# arithmetic on both engines — no percentile_approx error bounds, no
# interpolated floats, layout-invariant by construction (the k-th
# smallest element of a multiset does not depend on tie order).
DOC_LENGTH_QUANTILES_ORACLE = """
    WITH cnt AS (
        SELECT lang AS g, n_chars AS len, count(*) AS c
        FROM documents GROUP BY g, len
    ),
    cum AS (
        SELECT g, len,
               sum(c) OVER (PARTITION BY g ORDER BY len) AS cum,
               sum(c) OVER (PARTITION BY g) AS n
        FROM cnt
    ),
    ps AS (SELECT * FROM (VALUES (25, 100), (50, 100), (75, 100),
                                 (90, 100)) AS v(num, den))
    SELECT g AS lang,
           CAST(num * 100 / den AS INT) AS pct,
           CAST(n AS BIGINT) AS n_docs,
           min(len) AS q_len
    FROM cum CROSS JOIN ps
    WHERE cum * den >= num * n
    GROUP BY g, num, den, n
    ORDER BY lang, pct
    """


def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_length_quantiles(load(spark, sf_dir, "documents"))


# The FIFTH streaming twin (staged r16, wave-13 bank addendum): the
# native session_window state machine drained to convergence via
# complete mode + far-future watermark (streaming/stream_ops.py:
# drained_sessionize — boundary/merge/floor semantics documented there).
# Oracle: the batch SESSIONIZE gap-CTE (lag -> is_new -> cumsum -> group)
# re-projected to session_window's output convention: start = floor
# seconds of the first event, end = floor seconds of the last event +
# the 1800 s gap (whole-second gap commutes with the floor). All-integer
# output — hash-exact.
STREAMING_SESSIONIZE_ORACLE = """
    WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
    l AS (
        SELECT *, lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
        FROM t
    ),
    f AS (
        SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                       THEN 1 ELSE 0 END AS is_new
        FROM l
    ),
    s AS (
        SELECT *, CAST(sum(is_new) OVER (
            PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING
        ) AS BIGINT) AS session_id
        FROM f
    )
    SELECT user_id,
           CAST(floor(min(tsu) / 1000000) AS BIGINT) AS session_start_s,
           CAST(floor(max(tsu) / 1000000) + 1800 AS BIGINT) AS session_end_s,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_start_s
    """


def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.streaming import stream_ops as SO

    return SO.drained_sessionize(spark, sf_dir, n_batches=4)


# STAGED r16 (wave-13 bank addendum) — the SIXTH streaming twin: online
# first-occurrence near-duplicate MARKING via a streaming MinHash-LSH
# band index (streaming/stream_ops.py:streaming_neardup_index /
# drained_neardup_mark). Signatures are stateless array-HOF expressions
# (dedup.py:band_rows_stateless — value-identical to the batch groupBy
# min form); the query's single stateful aggregation maintains the
# per-band min(doc_id), which is associative, hence micro-batch-
# invariant. Oracle: a doc is a near-dup iff an earlier doc shares a
# band bucket — per-band minima, no pair graph (the tombstone-retaining
# online rule; deliberately distinct from neardup_dedup's transitive
# clusters, see the drain docstring). All-integer/bool output.
STREAMING_NEARDUP_ORACLE = f"""
    WITH {_minhash_bands_ctes()},
    m AS (
        SELECT band_id, band_hash, min(doc_id) AS min_doc
        FROM bands GROUP BY 1, 2
    ),
    fl AS (
        SELECT b.doc_id,
               max(CASE WHEN m.min_doc < b.doc_id THEN 1 ELSE 0 END) AS isd
        FROM bands b
        JOIN m ON m.band_id = b.band_id AND m.band_hash = b.band_hash
        GROUP BY b.doc_id
    )
    SELECT d.doc_id, coalesce(fl.isd = 1, FALSE) AS is_dup
    FROM documents d LEFT JOIN fl ON fl.doc_id = d.doc_id
    ORDER BY d.doc_id
    """


def q_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.streaming import stream_ops as SO

    return SO.drained_neardup_mark(spark, sf_dir, n_batches=4)


# STAGED r16 (wave-13 bank addendum) — the SEVENTH streaming twin and
# the first with TWO inputs: orders STREAM joined to the STATIC customer
# dimension (stream-static broadcast join — stateless, the dimension is
# the build side so the stream never shuffles for the join), then the
# one stateful aggregation keeps per-segment running (count, cent-sum):
# state bounded by |segments|. Integer-cents sums are associative, so
# the converged totals are micro-batch-invariant
# (streaming/stream_ops.py:streaming_segment_revenue /
# drained_segment_revenue).
STREAMING_SEGMENT_REVENUE_ORACLE = """
    SELECT c_mktsegment AS segment,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """


def q_streaming_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.streaming import stream_ops as SO

    return SO.drained_segment_revenue(spark, sf_dir, n_batches=4)


# STAGED r16 (wave-13 bank addendum) — the EIGHTH streaming twin: a
# Count-Min sketch maintained AS streaming state
# (streaming/stream_ops.py:streaming_token_cms / drained_token_cms).
# CMS linearity (union sketch = cell-wise sum) is the associativity the
# drain relies on; state is bounded by depth x width, never the stream.
# Shares TOKEN_CMS_ORACLE verbatim with the rotated-out batch twin —
# identical output contract, streaming mechanics.
STREAMING_TOKEN_CMS_ORACLE = TOKEN_CMS_ORACLE


def q_streaming_token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compute_histogram_spark.streaming import stream_ops as SO

    return SO.drained_token_cms(spark, sf_dir, n_batches=4)
