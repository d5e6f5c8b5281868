"""Declared query surface: every engine capability as a named query with
a DuckDB oracle (SURVEY §5 item 1 — the driver's correctness gate).

Design rules for oracle-hash stability:

- **Money/double sums are computed in integer cents** (the fixtures'
  money columns are 2-decimal doubles): ``sum(cast(round(x*100) as
  long))`` is exact integer arithmetic — identical regardless of
  partitioning/order — then one final division. A plain ``sum(double)``
  differs between engines in the last ulps because addition order
  differs. This matters at 100 TB too: deterministic aggregates make
  results reproducible across cluster sizes.
- Every integer output is cast to long (DuckDB ``sum`` yields HUGEINT,
  Spark ``size`` yields int — both normalized to BIGINT).
- Sorted/limited queries carry a full tie-break so the row *set* is
  deterministic.
- Nondeterministic leaves (now/uuid/rand/approx sketches) never reach
  oracle-checked outputs (SURVEY §7 hard part 3).

Spark side uses the DataFrame API (the engine surface); oracles are
independent ANSI SQL for DuckDB.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from gcs_parquet_dataflow_spark.catalog import load_table


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check (non-SQL-expressible)


CATALOG: dict[str, Query] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        CATALOG[name] = Query(name, fn, oracle)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def cents(col: Column) -> Column:
    """Exact integer cents from a 2-decimal double."""
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Aggregations (engine capability: groupBy/agg; reference itself has none —
# SURVEY §2.7 — these demonstrate the free Spark capability set)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0
               AS sum_base_price,
           sum(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT)))
               /10000.0 AS sum_disc_price,
           sum(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))
               * (100 + CAST(round(l_tax*100) AS BIGINT)))
               /1000000.0 AS sum_charge,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the classic scan→partial-agg→final-agg plan;
    map-side combine means the shuffle carries ≤ |groups| rows/partition.

    Accumulator bounds (round-9 overflow audit, SCALE.md): the per-row
    cent PRODUCTS fit int64 at any price (≤ ~1.1e11 real-world), but
    the per-GROUP sums do not at 100 TB — sum_charge ≈ 1e11/row ×
    1.5e11 rows/group ≈ 1e22 ≫ 2^63, so the disc_price/charge sums
    accumulate in DECIMAL(38,0) (exact to 1e38; DuckDB's sum() is
    already exact via int128).  Single-factor Σcents stays int64
    (≈ 5.7e17 at 100 TB, 16× headroom)."""
    li = t(spark, sf_dir, "lineitem")
    ep, dc, tx = cents(F.col("l_extendedprice")), cents(F.col("l_discount")), cents(
        F.col("l_tax")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        (F.sum(ep) / 100.0).alias("sum_base_price"),
        (F.sum((ep * (100 - dc)).cast("decimal(38,0)")) / 10000.0).alias(
            "sum_disc_price"
        ),
        (
            F.sum((ep * (100 - dc) * (100 + tx)).cast("decimal(38,0)"))
            / 1000000.0
        ).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_distinct",
    """
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0
               AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents(F.col("o_totalprice"))) / 100.0).alias("total_price"),
    )


@query(
    "agg_salted_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_distinct(spark, sf_dir):
    """Skew-safe two-phase count-distinct (operators/skew.py): value-hash
    sharding bounds per-reducer distinct state; the oracle is the plain
    COUNT(DISTINCT) it must equal exactly."""
    from gcs_parquet_dataflow_spark.operators.skew import salted_count_distinct

    li = t(spark, sf_dir, "lineitem")
    return salted_count_distinct(
        li, ["l_returnflag"], "l_partkey", buckets=16, out="n_parts"
    )


@query(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


@query(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_pivot",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("long")))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
    )


@query(
    "agg_statistics",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
           round(stddev_samp(l_extendedprice), 6) AS sd_price,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(skewness(l_extendedprice), 6) AS skew_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_statistics(spark, sf_dir):
    """Statistical aggregates (exact percentile via sort-based agg,
    stddev/corr/skewness via one-pass moments) — verified to match
    DuckDB at the 1e-6 grain. Spark's ``skewness`` is the POPULATION
    moment g1 while DuckDB's is the bias-adjusted SAMPLE statistic
    G1 = g1·√(n(n−1))/(n−2); the Spark side applies that exact factor
    so both engines state the same estimator at any group size (the
    bias gap only dips under 1e-6 rounding for n ≳ thousands). At
    scale, prefer approx_percentile for percentiles on data-sized
    groups (sketch-mergeable, no per-group sort)."""
    li = t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    sample_skew = F.skewness("l_extendedprice") * F.sqrt(n * (n - 1)) / (n - 2)
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95_price"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(sample_skew, 6).alias("skew_price"),
    )


@query(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0
               AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL API (the engine registers the
    fixture tables as temp views, so spark.sql sees the same catalog the
    DuckDB oracle does)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0
                   AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Joins (engine capability: J1-J3 + standard join types, SURVEY §2.5)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    """
    SELECT o_orderkey,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
               /10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. customer is the small side → broadcast; lineitem⋈
    orders shuffles on the order key (the natural 100 TB co-location key)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ep, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           sum(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT)))
               /10000.0 AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: all dimension tables broadcast; only the
    lineitem⋈orders join shuffles."""
    c, o, li = (t(spark, sf_dir, x) for x in ("customer", "orders", "lineitem"))
    s, n, r = (t(spark, sf_dir, x) for x in ("supplier", "nation", "region"))
    ep, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        # DECIMAL(38,0) accumulator (round-9 audit): 25 nation groups
        # over the full join ≈ 2.4e10 rows × 3.6e8/row ≈ 8.6e18 at
        # 100 TB — at the int64 wrap point
        .agg(
            (F.sum((ep * (100 - dc)).cast("decimal(38,0)")) / 10000.0)
            .alias("revenue")
        )
    )


@query(
    "join_left_outer",
    """
    SELECT c_custkey, c_name,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0)
                AS BIGINT)/100.0 AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.coalesce(F.sum(cents(F.col("o_totalprice"))), F.lit(0)) / 100.0).alias(
                "spend"
            ),
        )
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "prefix_route_first_match",
    """
    SELECT doc_id, source,
           CASE WHEN starts_with(source, 'src1') THEN 'cfg_src1_family'
                WHEN starts_with(source, 'src') THEN 'cfg_generic'
                ELSE NULL END AS config_id
    FROM documents
    """,
)
def prefix_route_first_match(spark, sf_dir):
    """The reference's J1 prefix theta join (main.py:37-63) as a declared
    query: overlapping prefixes, first match in config order wins."""
    from gcs_parquet_dataflow_spark.config.model import load_configs
    from gcs_parquet_dataflow_spark.operators.routing import with_routing

    configs = load_configs(
        [
            {"config_id": "cfg_src1_family", "source_gcs_prefix": "src1",
             "field_mappings": []},
            {"config_id": "cfg_generic", "source_gcs_prefix": "src",
             "field_mappings": []},
        ]
    )
    d = t(spark, sf_dir, "documents")
    return with_routing(d, configs, uri_col="source").select(
        "doc_id", "source", "config_id"
    )


@query(
    "prefix_route_first_match_join",
    """
    SELECT doc_id, source,
           CASE WHEN starts_with(source, 'src1') THEN 'cfg_src1_family'
                WHEN starts_with(source, 'src') THEN 'cfg_generic' END
               AS config_id
    FROM documents
    WHERE starts_with(source, 'src')
    """,
)
def prefix_route_first_match_join(spark, sf_dir):
    """Same first-match routing semantics through the ``route_join``
    strategy (broadcast theta join + min_by argmin on a synthetic row id)
    — the general form for config sets too large to inline as a when-
    chain. Unmatched rows drop (inner join), matching the reference's
    unmatched-URIs-are-only-counted behavior."""
    from gcs_parquet_dataflow_spark.config.model import load_configs
    from gcs_parquet_dataflow_spark.operators.routing import route_join

    configs = load_configs(
        [
            {"config_id": "cfg_src1_family", "source_gcs_prefix": "src1",
             "field_mappings": []},
            {"config_id": "cfg_generic", "source_gcs_prefix": "src",
             "field_mappings": []},
        ]
    )
    d = t(spark, sf_dir, "documents")
    return route_join(d, configs, uri_col="source").select(
        "doc_id", "source", "config_id"
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT)/10000.0
               AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND round(l_discount*100) BETWEEN 2 AND 4 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan→filter→single-agg — the plan is one
    codegen'd stage with every filter at the scan."""
    li = t(spark, sf_dir, "lineitem")
    dc = cents(F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & dc.between(2, 4)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents(F.col("l_extendedprice")) * dc) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
               /10000.0 AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    ep, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q12_shipmode_priority",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority LIKE '1-%'
                           OR o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT LIKE '1-%'
                          AND o_orderpriority NOT LIKE '2-%' THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: conditional counting over a fact join."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT))
                   ELSE 0 END)
               / sum(CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))), 6)
               AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — conditional ratio over a
    broadcast dimension join, exact integer-cents arithmetic.

    Accumulator bounds (round-9 audit, second pass — this site hid
    behind the `disc`/`promo` locals): the denominator is a GLOBAL,
    UNFILTERED two-factor cent sum ≈ 3.6e8/row × 6e11 rows ≈ 2.2e20 at
    100 TB — past 2^63, so both sums accumulate in DECIMAL(38,0) (the
    oracle's DuckDB sums are int128 natively; ratio identical)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    ep, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    disc = ep * (100 - dc)
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo.cast("decimal(38,0)"))
                / F.sum(disc.cast("decimal(38,0)")),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q16_supplier_diversity",
    """
    SELECT p_brand, p_type,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_size IN (1, 5, 9)
    GROUP BY p_brand, p_type
    """,
)
def q16_supplier_diversity(spark, sf_dir):
    """TPC-H Q16 shape (lineitem as the part↔supplier bridge): distinct
    suppliers per part attribute slice."""
    p = t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9))
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH pa AS (SELECT l_partkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                           / count(*) AS avg_qty
                FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
               /100.0/7.0 AS avg_yearly
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  JOIN pa ON pa.l_partkey = lineitem.l_partkey
    WHERE p_brand = (SELECT min(p_brand) FROM part)
      AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated avg-quantity subquery, decorrelated
    into a per-part aggregate + join (what Catalyst does to the SQL form
    anyway). The average is computed as exact-integer sum / count so both
    engines compare against bit-identical thresholds."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    min_brand = p.agg(F.min("p_brand")).collect()[0][0]  # tiny driver scalar
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.sum(F.col("l_quantity").cast("long")).cast("double") / F.count(F.lit(1)))
        .alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") == min_brand)),
                li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.pa_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(cents(F.col("l_extendedprice"))) / 100.0 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q18_large_orders",
    """
    SELECT c_custkey, o_orderkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey
    HAVING sum(CAST(l_quantity AS BIGINT)) > 300
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: groupBy + HAVING on the aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
               /10000.0 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_size BETWEEN 1 AND 5 AND l_quantity <= 20)
       OR (p_size BETWEEN 6 AND 10 AND l_quantity > 20)
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — exercises
    Catalyst's CNF conversion / partial pushdown of disjuncts."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    ep, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    cond = (F.col("p_size").between(1, 5) & (F.col("l_quantity") <= 20)) | (
        F.col("p_size").between(6, 10) & (F.col("l_quantity") > 20)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("revenue"))
    )


@query(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)
                 / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)/100.0
               AS totacctbal
    FROM customer
    WHERE CAST(round(c_acctbal*100) AS BIGINT) > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderstatus = 'P')
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: scalar aggregate subquery (exact-cents average,
    broadcast as a 1-row cross join) + anti join + final aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    bal = cents(F.col("c_acctbal"))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(bal > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal) / 100.0).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming-analog queries (batch formulations of the W1/D1 windowed-dedup
# and session semantics; the same operators drive Structured Streaming)
# ---------------------------------------------------------------------------


@query(
    "stream_dedup_5min_windows",
    """
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT))
               AS TIMESTAMP) AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def stream_dedup_5min_windows(spark, sf_dir):
    """The reference's W1+D1 (5-minute tumbling dedup windows,
    main.py:461-463) as a batch query: distinct keys per epoch-aligned
    5-min window. In streaming the identical grouping runs with
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` (see
    streaming/pipeline.py); F.window's buckets are epoch-aligned exactly
    like floor(epoch/300)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_distinct_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_distinct_users",
            "n_events",
        )
    )


@query(
    "sessionize_events",
    """
    WITH g AS (SELECT user_id, ts, event_id,
                      epoch(ts) - epoch(lag(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id))
                          AS gap
               FROM events)
    SELECT user_id,
           CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag + conditional
    count per user — the batch analog of a session_window streaming agg."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        e.select("user_id", gap.alias("gap"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0)
            ).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions / sorts / limits / set ops (SURVEY §2.8 capability set)
# ---------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      FROM orders) WHERE rk <= 5
    """,
)
def window_topk_per_group(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rk"),
        ).filter(F.col("rk") <= 5)
    )


@query(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS running_cents
    FROM orders
    """,
)
def window_running_total(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(cents(F.col("o_totalprice"))).over(w).alias("running_cents"),
    )


@query(
    "window_lag_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def window_lag_gap_days(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias(
            "days_since_prev"
        ),
    )


@query(
    "sort_limit_topn",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
    """,
)
def sort_limit_topn(spark, sf_dir):
    """Top-N: Spark runs TakeOrderedAndProject — per-partition heaps, no
    full sort, no single-node shuffle. The 100 TB-safe top-k."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@query(
    "set_union_distinct",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_union_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.union(b).distinct()


@query(
    "set_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


@query(
    "set_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus <> 'F'
    """,
)
def set_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    return c.select("c_custkey").exceptAll(
        o.select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.11 surface) + filters/projections
# ---------------------------------------------------------------------------


@query(
    "filter_project_pushdown",
    """
    SELECT l_orderkey, l_extendedprice FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
      AND l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_project_pushdown(spark, sf_dir):
    """Filters + 2-column projection — `.explain` shows PushedFilters and
    a pruned ReadSchema (the free upgrade over the reference, SURVEY §4)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1998-06-01")
        & (F.col("l_quantity") > 45)
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_extendedprice")


@query(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           p_brand || '#' || p_type AS brand_type,
           replace(p_name, ' ', '_') AS name_underscored,
           trim(p_name) AS name_trim,
           CAST(starts_with(p_type, 'STANDARD') AS BOOLEAN) AS is_standard,
           CAST(regexp_matches(p_name, '[aeiou]{2}') AS BOOLEAN) AS has_double_vowel
    FROM part
    """,
)
def scalar_string_funcs(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_underscored"),
        F.trim("p_name").alias("name_trim"),
        F.col("p_type").startswith("STANDARD").alias("is_standard"),
        F.col("p_name").rlike("[aeiou]{2}").alias("has_double_vowel"),
    )


@query(
    "scalar_string_funcs2",
    """
    SELECT p_partkey,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist,
           lpad(p_brand, 12, '*') AS brand_pad,
           rpad(substr(p_type, 1, 4), 8, '.') AS type_pad,
           translate(p_name, 'aeiou', 'AEIOU') AS name_vowels_upper,
           reverse(p_brand) AS brand_rev,
           repeat(substr(p_brand, 1, 2), 3) AS brand_rep,
           split_part(p_type, ' ', 1) AS type_first_word,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a_pos,
           left(p_name, 6) AS name_left,
           right(p_name, 4) AS name_right
    FROM part
    """,
)
def scalar_string_funcs2(spark, sf_dir):
    """Second string-function tier: edit distance, padding, translate,
    reverse/repeat, token extraction, positional search, left/right."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.rpad(F.substring("p_type", 1, 4), 8, ".").alias("type_pad"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels_upper"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_brand", 1, 2), 3).alias("brand_rep"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias(
            "type_first_word"
        ),
        F.instr("p_name", "a").cast("long").alias("first_a_pos"),
        F.substring("p_name", 1, 6).alias("name_left"),
        F.col("p_name").substr(F.length("p_name") - 3, F.lit(4)).alias(
            "name_right"
        ),
    )


@query(
    "scalar_regexp_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]+', '_', 'g') AS name_devoweled,
           CAST(regexp_matches(p_type, '^(STANDARD|PROMO)') AS BOOLEAN)
               AS is_std_or_promo,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT)
               AS n_word_runs
    FROM part
    """,
)
def scalar_regexp_funcs(spark, sf_dir):
    """Regexp surface: group extraction (empty string on no-match in
    both engines), global replace, anchored match, match counting."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]+", "_").alias("name_devoweled"),
        F.col("p_type").rlike("^(STANDARD|PROMO)").alias("is_std_or_promo"),
        F.regexp_count(F.col("p_name"), F.lit("[a-z]+")).cast("long").alias(
            "n_word_runs"
        ),
    )


@query(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS d,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
)
def scalar_date_funcs(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@query(
    "scalar_math_funcs",
    """
    SELECT c_custkey,
           abs(c_acctbal) AS abs_bal,
           CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
           CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
           round(c_acctbal, 1) AS round1_bal,
           round(sqrt(abs(c_acctbal)), 6) AS sqrt_bal,
           round(ln(abs(c_acctbal) + 1), 6) AS ln_bal,
           CAST(c_custkey % 7 AS BIGINT) AS mod7
    FROM customer
    """,
)
def scalar_math_funcs(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        F.ceil(bal).cast("long").alias("ceil_bal"),
        F.floor(bal).cast("long").alias("floor_bal"),
        F.round(bal, 1).alias("round1_bal"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("ln_bal"),
        (F.col("c_custkey") % 7).cast("long").alias("mod7"),
    )


@query(
    "null_semantics",
    """
    WITH s AS (SELECT event_id,
                      CASE WHEN event_id % 3 = 0 THEN NULL ELSE user_id END AS u,
                      CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
               FROM events)
    SELECT coalesce(CAST(u AS VARCHAR), '<null>') AS u_key,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(v) AS BIGINT) AS n_v,
           CAST(count(DISTINCT v) AS BIGINT) AS n_v_distinct,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_v_null,
           CAST(coalesce(sum(CAST(round(v*100) AS BIGINT)), 0) AS BIGINT)/100.0
               AS sum_v,
           CAST(max(v IS NULL AND u IS NULL) AS BOOLEAN) AS any_both_null
    FROM s GROUP BY u
    """,
)
def null_semantics(spark, sf_dir):
    """The classic SQL null traps, verified identical across engines:
    NULL grouping keys form one group, count(*) vs count(col) vs
    count(distinct col), sum over all-null → NULL (coalesced), and
    three-valued logic in aggregated predicates."""
    e = t(spark, sf_dir, "events")
    u = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("user_id"))
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    s = e.select(u.alias("u"), v.alias("v"))
    return s.groupBy("u").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_v"),
        F.countDistinct("v").alias("n_v_distinct"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_v_null"),
        (F.coalesce(F.sum(cents(F.col("v"))), F.lit(0)) / 100.0).alias("sum_v"),
        F.max(F.col("v").isNull() & F.col("u").isNull()).alias("any_both_null"),
    ).select(
        F.coalesce(F.col("u").cast("string"), F.lit("<null>")).alias("u_key"),
        "n_rows", "n_v", "n_v_distinct", "n_v_null", "sum_v", "any_both_null",
    )


@query(
    "conditional_case",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_adj
    FROM customer
    """,
)
def conditional_case(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_adj"),
    )


@query(
    "json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def json_extract(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@query(
    "array_map_funcs",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 6)
               AS sq_norm,
           round(list_max(embedding::DOUBLE[]), 6) AS max_c,
           round(list_min(embedding::DOUBLE[]), 6) AS min_c,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS BIGINT)
               AS n_positive,
           round(embedding[1]::DOUBLE, 6) AS first_c,
           round(list_sum(list_slice(embedding::DOUBLE[], 1, 8)), 6)
               AS head8_sum
    FROM embeddings
    """,
)
def array_map_funcs(spark, sf_dir):
    """Array-function surface (SURVEY §2.11: the engine exposes Spark's
    transform/filter/aggregate/slice even though the reference used
    none): elementwise transform+fold, predicates, indexing, slicing
    over the embedding arrays."""
    e = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("sq_norm"),
        F.round(F.array_max(v), 6).alias("max_c"),
        F.round(F.array_min(v), 6).alias("min_c"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.round(F.element_at(v, 1), 6).alias("first_c"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
    )


@query(
    "timestamp_lenient_parse",
    """
    WITH s AS (SELECT event_id, date_trunc('second', ts) AS tsec FROM events),
    fmt AS (SELECT event_id, tsec,
              CASE event_id % 4
                WHEN 0 THEN strftime(tsec, '%Y-%m-%dT%H:%M:%S')
                WHEN 1 THEN strftime(tsec, '%Y/%m/%d %H:%M:%S')
                WHEN 2 THEN strftime(tsec, '%d %b %Y %H:%M:%S')
                ELSE 'not a timestamp' END AS raw
            FROM s)
    SELECT event_id, raw,
           CASE WHEN event_id % 4 = 3 THEN NULL
                ELSE CAST(floor(epoch(tsec)) AS BIGINT) END AS parsed_epoch
    FROM fmt
    """,
)
def timestamp_lenient_parse(spark, sf_dir):
    """The unix_timestamp_auto string grammar (SURVEY §1.2, reference
    dateutil parse main.py:131-149): ISO, slashed, and day-month-name
    forms round-trip through the coalesce-of-try_to_timestamp ladder;
    garbage yields NULL (→ property omitted). Strings are derived from
    ts in both engines, so parse correctness = exact round-trip."""
    from gcs_parquet_dataflow_spark.functions.casts import parse_timestamp_lenient

    e = t(spark, sf_dir, "events")
    tsec = F.date_trunc("second", F.col("ts"))
    k = F.col("event_id")
    raw = (
        F.when(k % 4 == 0, F.date_format(tsec, "yyyy-MM-dd'T'HH:mm:ss"))
        .when(k % 4 == 1, F.date_format(tsec, "yyyy/MM/dd HH:mm:ss"))
        .when(k % 4 == 2, F.date_format(tsec, "dd MMM yyyy HH:mm:ss"))
        .otherwise(F.lit("not a timestamp"))
    )
    return e.select(
        "event_id",
        raw.alias("raw"),
        F.unix_timestamp(parse_timestamp_lenient(raw)).alias("parsed_epoch"),
    )


@query(
    "json_typed_struct",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           CAST(json_array_length(json_extract(props, '$.missing')) IS NOT NULL
                AS BOOLEAN) AS has_missing
    FROM events
    """,
)
def json_typed_struct(spark, sf_dir):
    """Typed JSON decode: from_json with a declared schema (vs the
    string-path get_json_object in json_extract) — the 100 TB-preferred
    form since the parse happens once into columnar fields."""
    from pyspark.sql import types as T

    e = t(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("missing", T.ArrayType(T.LongType())),
        ]
    )
    parsed = F.from_json("props", schema)
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        parsed.getField("missing").isNotNull().alias("has_missing"),
    )


@query(
    "explode_words",
    """
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def explode_words(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "event_time_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)/100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def event_time_window_agg(spark, sf_dir):
    """Tumbling event-time window — the batch analog of the streaming
    windowed agg (same F.window operator drives Structured Streaming)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# The reference's core transform as a declared query (T1, deterministic)
# ---------------------------------------------------------------------------


@query(
    "transform_cast_ladders",
    """
    WITH s AS (SELECT event_id,
      CASE event_id % 8 WHEN 0 THEN 'true' WHEN 1 THEN '1' WHEN 2 THEN 'T'
           WHEN 3 THEN 'y' WHEN 4 THEN 'YES' WHEN 5 THEN 'no'
           WHEN 6 THEN '' ELSE '0' END AS sb,
      CASE event_id % 4 WHEN 0 THEN CAST(event_id AS VARCHAR)
           WHEN 1 THEN 'abc' WHEN 2 THEN '12.5' ELSE ' 7 ' END AS sn
    FROM events)
    SELECT event_id,
           lower(sb) IN ('true','1','t','y','yes') AS bool_out,
           CASE WHEN regexp_matches(trim(sn), '^[+-]?[0-9]+$')
                THEN CAST(trim(sn) AS BIGINT) END AS int_out,
           try_cast(trim(sn) AS DOUBLE) AS float_out
    FROM s
    """,
)
def transform_cast_ladders(spark, sf_dir):
    """The reference's per-type cast semantics (SURVEY §1.2) on derived
    adversarial strings: boolean truthy-set membership ('T'/'y'/'YES'
    pass, 'no'/''/'0' fail — a plain cast("boolean") gets these wrong),
    int-cast failure → NULL/omit ('abc', '12.5'), float parse."""
    from pyspark.sql import types as T

    from gcs_parquet_dataflow_spark.functions import casts

    e = t(spark, sf_dir, "events")
    k = F.col("event_id")
    sb = (
        F.when(k % 8 == 0, "true").when(k % 8 == 1, "1").when(k % 8 == 2, "T")
        .when(k % 8 == 3, "y").when(k % 8 == 4, "YES").when(k % 8 == 5, "no")
        .when(k % 8 == 6, "").otherwise("0")
    )
    sn = (
        F.when(k % 4 == 0, k.cast("string")).when(k % 4 == 1, "abc")
        .when(k % 4 == 2, "12.5").otherwise(" 7 ")
    )
    st = T.StringType()
    return e.select(
        "event_id",
        casts.cast_boolean(sb, st).alias("bool_out"),
        casts.cast_integer(sn, st).alias("int_out"),
        casts.cast_float(sn, st).alias("float_out"),
    )


@query(
    "transform_nan_normalization",
    """
    WITH s AS (SELECT event_id,
                      CASE WHEN event_id % 5 = 0 THEN 'NaN'::DOUBLE
                           ELSE value END AS v
               FROM events)
    SELECT event_id,
           CASE WHEN isnan(v) THEN NULL ELSE v END AS v_clean,
           CAST(isnan(v) AS BOOLEAN) AS was_nan
    FROM s
    """,
)
def transform_nan_normalization(spark, sf_dir):
    """NaN→NULL normalization (SURVEY §7 hard part 4, reference
    _clean_nan_value main.py:113-119): Spark keeps NaN distinct from
    NULL in doubles — every ingest path routes through nan_to_null so
    downstream aggregates/filters see one missing-value representation
    (a NaN silently poisons sums; a NULL is skipped)."""
    from pyspark.sql import types as T

    from gcs_parquet_dataflow_spark.functions.casts import nan_to_null

    e = t(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 5 == 0, F.lit(float("nan"))).otherwise(
        F.col("value")
    )
    return e.select(
        "event_id",
        nan_to_null(v, T.DoubleType()).alias("v_clean"),
        F.isnan(v).alias("was_nan"),
    )


@query(
    "scalar_date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
               AS days_since_epoch_start,
           CAST(round(date_diff('month', TIMESTAMP '1995-01-01', o_orderdate)
               , 0) AS BIGINT) AS whole_months,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def scalar_date_arithmetic(spark, sf_dir):
    """Date arithmetic surface: interval add, day/month diffs, day-of-
    week, end-of-month. (DuckDB date_diff counts whole-unit boundaries;
    Spark's datediff/months_between differ subtly — the Spark side uses
    boundary-counting formulations to match.)"""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    start = F.lit("1995-01-01").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(d.cast("date"), start.cast("date")).cast("long").alias(
            "days_since_epoch_start"
        ),
        (
            (F.year(d) - F.lit(1995)) * 12 + (F.month(d) - F.lit(1))
        ).cast("long").alias("whole_months"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.last_day(d.cast("date")).alias("month_end"),
    )


@query(
    "transform_required_dlq",
    """
    SELECT 'missing_required_field' AS error_type,
           'required field ''user_id_n'' is null' AS reason,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE event_id % 7 = 0
    """,
)
def transform_required_dlq(spark, sf_dir):
    """Required-field DLQ semantics (F3, main.py:211-217): rows whose
    required source field is null route to the dead-letter side with a
    structured error; the oracle recomputes the split condition."""
    from gcs_parquet_dataflow_spark.config.model import load_configs
    from gcs_parquet_dataflow_spark.plans.compiler import (
        CompilerOptions,
        compile_config,
        split_dlq,
    )

    e = t(spark, sf_dir, "events").withColumn(
        "user_id_n",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("long")).otherwise(
            F.col("user_id")
        ),
    )
    config = load_configs(
        [
            {
                "config_id": "dlq_demo",
                "source_gcs_prefix": "gs://any/",
                "mixpanel_event_name_from_field": "event_type",
                "field_mappings": [
                    {"source_field": "user_id_n", "mixpanel_field": "$user_id",
                     "type": "string", "is_required_in_source": True},
                ],
            }
        ]
    )[0]
    compiled = compile_config(config, e.schema, CompilerOptions())
    _ok, dlq = split_dlq(compiled.apply(e))
    return dlq.groupBy(
        F.col("_error.error_type").alias("error_type"),
        F.col("_error.reason").alias("reason"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "transform_wildcard_passthrough",
    """
    SELECT event_type AS event,
           CAST(floor(epoch(ts)) AS BIGINT) AS time,
           CAST(user_id AS VARCHAR) AS user_id,
           value, props,
           CAST(event_id AS BIGINT) AS event_id
    FROM events
    """,
)
def transform_wildcard_passthrough(spark, sf_dir):
    """Wildcard passthrough (main.py:198-201, 266-269): source columns
    not consumed by an explicit mapping are copied verbatim into the
    properties; explicitly-mapped columns (ts→time, user_id→$user_id)
    are excluded from the wildcard."""
    from gcs_parquet_dataflow_spark.config.model import load_configs
    from gcs_parquet_dataflow_spark.plans.compiler import (
        CompilerOptions,
        compile_config,
        split_dlq,
    )

    e = t(spark, sf_dir, "events")
    config = load_configs(
        [
            {
                "config_id": "wild",
                "source_gcs_prefix": "gs://any/",
                "mixpanel_event_name_from_field": "event_type",
                "field_mappings": [
                    {"source_field": "ts", "mixpanel_field": "time",
                     "type": "unix_timestamp_auto"},
                    {"source_field": "user_id", "mixpanel_field": "$user_id",
                     "type": "string"},
                    {"source_field": "event_type", "mixpanel_field": "_etype",
                     "type": "string"},
                    {"source_field": "*", "mixpanel_field": "*"},
                ],
            }
        ]
    )[0]
    compiled = compile_config(config, e.schema, CompilerOptions())
    ok, _dlq = split_dlq(compiled.apply(e))
    return ok.select(
        F.col("event"),
        F.col("properties.time").alias("time"),
        F.col("properties.`$user_id`").alias("user_id"),
        F.col("properties.value").alias("value"),
        F.col("properties.props").alias("props"),
        F.col("properties.event_id").alias("event_id"),
    )


@query(
    "events_transform",
    """
    SELECT event_type AS event,
           CAST(floor(epoch(ts)) AS BIGINT) AS time_epoch,
           CAST(user_id AS VARCHAR) AS user_id,
           CAST(event_id AS VARCHAR) AS insert_id,
           value
    FROM events
    WHERE event_type IS NOT NULL AND event_type != ''
    """,
)
def events_transform(spark, sf_dir):
    """The config-compiled projection/cast/enrich operator (SURVEY §2.6)
    over the events table, deterministic subset (no now()/uuid())."""
    from gcs_parquet_dataflow_spark.config.model import load_configs
    from gcs_parquet_dataflow_spark.plans.compiler import (
        CompilerOptions,
        compile_config,
        split_dlq,
    )

    e = t(spark, sf_dir, "events")
    config = load_configs(
        [
            {
                "config_id": "events",
                "source_gcs_prefix": "gs://any/",
                "mixpanel_event_name_from_field": "event_type",
                "field_mappings": [
                    {"source_field": "ts", "mixpanel_field": "time",
                     "type": "unix_timestamp_auto"},
                    {"source_field": "user_id", "mixpanel_field": "$user_id",
                     "type": "string"},
                    {"source_field": "event_id", "mixpanel_field": "$insert_id",
                     "type": "string_or_uuid"},
                    {"source_field": "value", "mixpanel_field": "value",
                     "type": "float"},
                ],
            }
        ]
    )[0]
    compiled = compile_config(config, e.schema, CompilerOptions())
    ok, _dlq = split_dlq(compiled.apply(e))
    return ok.select(
        F.col("event"),
        F.col("properties.time").alias("time_epoch"),
        F.col("properties.`$user_id`").alias("user_id"),
        F.col("properties.`$insert_id`").alias("insert_id"),
        F.col("properties.value").alias("value"),
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H query shapes (round 2). The fixture schema is reduced
# TPC-H (no partsupp, no commit/receipt dates), so q2/q9/q11/q20/q21 are
# ADAPTED: same plan shape (correlated max, scalar-subquery HAVING,
# exists / not-exists double correlation), predicates rewritten onto the
# available columns. Docstrings note each adaptation.
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS → left-semi join + agg. Adapted predicate:
    no commit/receipt dates in the fixture, so "late" = shipped more
    than 60 days after the order date."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_cents) AS BIGINT)/10000.0 AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))
                   AS volume_cents
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bidirectional nation-pair volume. The nation filter is
    applied INSIDE the dim joins (both broadcast), so the fact shuffle
    only carries rows for the two nations."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    vol = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(vol) / 10000.0).alias("revenue"))
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume_cents
                               ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume_cents) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))
                   AS volume_cents,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01')
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share — conditional-sum ratio over a
    star join; every dimension broadcast, one fact shuffle."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    vol = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_nation_profit",
    """
    SELECT nation, o_year, CAST(sum(volume_cents) AS BIGINT)/10000.0
               AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))
                   AS volume_cents
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%gear%')
    GROUP BY nation, o_year
    """,
)
def q9_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation × order year for a part
    name pattern. Adapted: the fixture has no partsupp/supplycost, so
    profit = discounted revenue (the join tree and agg shape are Q9's)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    n = t(spark, sf_dir, "nation")
    vol = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(vol) / 10000.0).alias("sum_profit"))
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: orders-per-customer histogram via left outer join with
    a join-side predicate (the filter must NOT drop customers — it
    belongs in the join condition, not a WHERE). Adapted predicate:
    no comment column, so non-urgent priority stands in."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(round(l_discount*100) AS BIGINT)))
                  AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_cents/10000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cents = (SELECT max(total_cents) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: top supplier by quarterly revenue — the scalar
    max-subquery is a 1-row broadcast join against the revenue table
    (computed once, reused for both sides). Integer-cents revenue makes
    the max-equality exact."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    vol = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(vol).alias("total_cents"))
    )
    mx = revenue.agg(F.max("total_cents").alias("_max"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_cents") == F.col("_max"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name",
            (F.col("total_cents") / 10000.0).alias("total_revenue"),
        )
    )


@query(
    "q2_top_acctbal_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part
    JOIN ps ON p_partkey = l_partkey
    JOIN eu ON l_suppkey = s_suppkey
    WHERE p_type = 'LARGE'
      AND s_acctbal = (SELECT max(eu2.s_acctbal)
                       FROM ps ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
                       WHERE ps2.l_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q2_top_acctbal_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated per-part MAX subquery → window max over
    the candidate join (one pass, no re-join). Adapted: no partsupp
    table, so the part↔supplier relation is the DISTINCT (l_partkey,
    l_suppkey) pairs from lineitem, and min supplycost becomes max
    supplier account balance among EUROPE suppliers of the part."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = W.partitionBy("p_partkey")
    return (
        cand.withColumn("_mx", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_mx"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(20)
    )


@query(
    "q11_important_parts",
    """
    WITH v AS (SELECT l_partkey,
                      CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
                           AS BIGINT) AS value_cents
               FROM lineitem
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name = 'NATION_5'
               GROUP BY l_partkey)
    SELECT l_partkey, value_cents/100.0 AS part_value
    FROM v
    WHERE value_cents > (SELECT sum(value_cents)*0.002 FROM v)
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: per-group value filtered by a GLOBAL scalar
    threshold (fraction of the grand total) — the scalar subquery is a
    1-row broadcast cross join, and the grouped table is computed ONCE
    and persisted for both uses. Adapted: value = extended price of one
    nation's suppliers' lineitems (no partsupp in the fixture)."""
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        persist_intermediate,
    )

    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    v = persist_intermediate(
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("value_cents"))
    )
    thresh = v.agg((F.sum("value_cents") * 0.002).alias("_t"))
    return (
        v.join(F.broadcast(thresh), F.col("value_cents") > F.col("_t"))
        .select("l_partkey", (F.col("value_cents") / 100.0).alias("part_value"))
    )


@query(
    "q20_promotion_suppliers",
    """
    WITH shipped AS (SELECT l_suppkey, l_partkey,
                            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                                AS qty
                     FROM lineitem
                     WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate < TIMESTAMP '1997-01-01'
                     GROUP BY l_suppkey, l_partkey)
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (SELECT l_suppkey FROM shipped
                        JOIN part ON l_partkey = p_partkey
                        WHERE p_name LIKE 'small%' AND qty > 15)
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested IN-subqueries → one aggregation + semi
    join chain. Adapted: availqty > half-of-shipped becomes total 1996
    shipped quantity > 15 of any 'small%' part (no partsupp)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    qualifying = (
        shipped.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") > 15)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH per AS (SELECT l_orderkey, l_suppkey,
                        max(CASE WHEN l_shipdate > o_orderdate
                                      + INTERVAL 60 DAY
                                 THEN 1 ELSE 0 END) AS late
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 GROUP BY l_orderkey, l_suppkey),
         agg AS (SELECT l_orderkey,
                        CAST(count(*) AS BIGINT) AS n_supp,
                        CAST(sum(late) AS BIGINT) AS n_late
                 FROM per GROUP BY l_orderkey)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per
    JOIN agg USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE per.late = 1 AND agg.n_supp > 1 AND agg.n_late = 1
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: "the ONLY late supplier on a multi-supplier
    order" — the reference formulation's EXISTS + NOT EXISTS double
    correlation rewritten as two aggregations over one per-(order,
    supplier) table (computed once, persisted), which shuffles the fact
    once instead of three self-joins. Adapted: late = shipped >60 days
    after order date (no receipt/commit dates)."""
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        persist_intermediate,
    )

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        1,
    ).otherwise(0)
    per = persist_intermediate(
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    agg = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    return (
        per.join(agg, "l_orderkey")
        .filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Round-2 surface widening: window frames, ordered string agg, unpivot,
# FILTER-style conditional aggregation
# ---------------------------------------------------------------------------


@query(
    "window_frame_funcs",
    """
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_key,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER
               (PARTITION BY o_orderstatus
                ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)/100.0
               AS rolling3_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_frame_funcs(spark, sf_dir):
    """Window frame surface: ntile, percent_rank, cume_dist,
    first/last_value over explicit ROWS frames, and a bounded rolling
    sum — all one pass over one partitioning (a single sort per
    partition serves every function)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_roll = w.rowsBetween(-2, W.currentRow)
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
        (F.sum(cents(F.col("o_totalprice"))).over(w_roll) / 100.0).alias(
            "rolling3_price"
        ),
    )


@query(
    "agg_string_concat",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_string_concat(spark, sf_dir):
    """Ordered string aggregation: concat_ws over a sort_array'd
    collect_list — deterministic regardless of partitioning (the
    unordered form is NOT reproducible across cluster sizes; always
    order before concatenating)."""
    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias(
            "nations"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, round(val, 6) AS val
    FROM (SELECT l_orderkey, l_linenumber,
                 l_quantity AS quantity,
                 l_extendedprice AS extendedprice,
                 l_discount AS discount
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (val FOR measure IN (quantity, extendedprice, discount))
    """,
)
def unpivot_measures(spark, sf_dir):
    """Wide→long unpivot (melt) of three measure columns via the
    unpivot/stack operator — per-row fan-out in the scan stage, no
    shuffle."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice", "l_discount")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "measure",
            "_v",
        )
        .select(
            "l_orderkey", "l_linenumber",
            F.regexp_replace("measure", "^l_", "").alias("measure"),
            F.round("_v", 6).alias("val"),
        )
    )


@query(
    "agg_filtered_counts",
    """
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                AS BIGINT) AS n_urgent,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_big,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
               /100.0 AS urgent_value,
           CAST(count(*) AS BIGINT) AS n_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_filtered_counts(spark, sf_dir):
    """FILTER-clause conditional aggregation: several differently-
    filtered aggregates in ONE pass (vs one scan per predicate) —
    count_if / conditional sum compile to the same partial-aggregate
    shape."""
    o = t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count_if(urgent).alias("n_urgent"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        (F.sum(F.when(urgent, cents(F.col("o_totalprice")))) / 100.0).alias(
            "urgent_value"
        ),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "scalar_bitwise_funcs",
    """
    SELECT event_id,
           event_id & 255 AS band,
           event_id | 4096 AS bor,
           xor(event_id, 1365) AS bxor,
           event_id << 3 AS shl,
           event_id >> 2 AS shr,
           CAST(bit_count(event_id) AS BIGINT) AS popcnt
    FROM events WHERE event_id < 2000
    """,
)
def scalar_bitwise_funcs(spark, sf_dir):
    """Bitwise scalar surface: and/or/xor, shifts, popcount — all
    codegen'd long arithmetic (the primitives the SimHash/LSH sketches
    build on, exposed as queryable functions)."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.col("event_id")
    return e.select(
        "event_id",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1365)).alias("bxor"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).cast("long").alias("popcnt"),
    )


@query(
    "array_set_funcs",
    """
    SELECT doc_id,
           list_sort(list_distinct(list_intersect(a, b))) AS inter,
           list_sort(list_distinct(a || b)) AS uni,
           list_sort(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))) AS diff,
           CAST(len(flatten([a, b])) AS BIGINT) AS n_flat
    FROM (SELECT doc_id,
                 [doc_id % 7, doc_id % 5, doc_id % 3] AS a,
                 [doc_id % 4, doc_id % 5] AS b
          FROM documents)
    """,
)
def array_set_funcs(spark, sf_dir):
    """Array set algebra (intersect/union/except/flatten) over derived
    arrays — per-row expressions in the scan stage; outputs sorted so
    both engines' set order agrees."""
    d = t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    a = F.array(k % 7, k % 5, k % 3)
    b = F.array(k % 4, k % 5)
    return d.select(
        "doc_id",
        F.array_sort(F.array_distinct(F.array_intersect(a, b))).alias("inter"),
        F.array_sort(F.array_distinct(F.array_union(a, b))).alias("uni"),
        F.array_sort(F.array_except(a, b)).alias("diff"),
        F.size(F.flatten(F.array(a, b))).cast("long").alias("n_flat"),
    )
