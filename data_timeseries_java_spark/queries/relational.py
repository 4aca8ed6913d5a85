"""General relational operator surface (SURVEY.md §2.7 / build plan M4).

The reference has no SQL surface; a general engine needs one. These
queries exercise scans with pushdown, filters, projections, hash
aggregation (plain / distinct / rollup), broadcast + shuffle joins,
semi/anti joins, set ops, window functions, sorts/limits, scalar
string/date/math functions, and sessionization over the TPC-H-ish tables.

Every query is written declaratively so Catalyst applies pushdown,
pruning, and join selection; dimension tables (region/nation/customer)
fall under the broadcast threshold automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_timeseries_java_spark.tables import load_table


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan → partial+final hash agg (A3/A5 analogue)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            # averages as rounded-sum / count: avg of decimal-terminating
            # data can land exactly on round-6 boundaries where summation
            # order flips the digit cross-engine; the sum rounded to its
            # native decimal scale is boundary-free, and the division of
            # identical doubles is deterministic
            F.round(F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective filter fully pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem):
    dims broadcast, fact tables shuffle-join on keys."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + global sort + limit (top-k by revenue)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    top = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )
    return top


def q_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: per-customer order ranking + running total."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wsum = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey")) \
                 .rowsBetween(Window.unboundedPreceding, 0)
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.row_number().over(w).cast("long").alias("price_rank"),
            F.round(F.sum("o_totalprice").over(wsum), 2).alias("running_spent"),
        )
        .where(F.col("price_rank") <= 3)
    )


def q_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate over two dims (multi-level hash agg)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders", "total",
        )
    )


def q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers with orders ∩ high-balance, minus
    low-balance (INTERSECT / EXCEPT)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    rich = customer.where(F.col("c_acctbal") > 5000).select("c_custkey")
    poor = customer.where(F.col("c_acctbal") < 0).select("c_custkey")
    return with_orders.intersect(rich).exceptAll(poor)


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (the reference's missing-key detection A1, relationally)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


def q_part_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library sampler: string/math/conditional, all
    JVM-side built-ins (whole-stage codegen, no UDFs)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.col("p_name").like("%al%").alias("has_al"),
        F.round(F.sqrt(F.col("p_retailprice")), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("price_log"),
        (F.col("p_size") % 7).cast("long").alias("size_mod"),
        F.when(F.col("p_retailprice") > 1500, "premium")
         .when(F.col("p_retailprice") > 900, "standard")
         .otherwise("budget").alias("tier"),
    )


def q_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (two-phase: per-key dedup then count)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap per user over `events`.
    Expressed as the lag/cumsum idiom (works identically in batch SQL
    engines; the streaming path uses session_window — see streaming/)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id", "value",
        F.when(
            F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w)) > 30 * 60 * 1000,
            1,
        ).otherwise(0).alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.unix_millis(F.min("ts")).alias("session_start_ms"),
        F.unix_millis(F.max("ts")).alias("session_last_ms"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("session_value"),
    )


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "forecast_revenue": q_forecast_revenue,
    "revenue_by_nation": q_revenue_by_nation,
    "top_customers": q_top_customers,
    "order_ranks": q_order_ranks,
    "priority_rollup": q_priority_rollup,
    "customer_set_ops": q_customer_set_ops,
    "customers_without_orders": q_customers_without_orders,
    "part_scalar_functions": q_part_scalar_functions,
    "distinct_suppliers": q_distinct_suppliers,
    "user_sessions": q_user_sessions,
}

ORACLE = {
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(round(sum(l_quantity), 2) / count(*), 6) AS avg_qty,
       round(round(sum(l_extendedprice), 2) / count(*), 6) AS avg_price,
       round(round(sum(l_discount), 2) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "forecast_revenue": """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""",
    "revenue_by_nation": """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    "top_customers": """
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 2) AS total_spent,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey ASC
LIMIT 10
""",
    "order_ranks": """
SELECT o_custkey, o_orderkey, price_rank, running_spent FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate ASC, o_orderkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spent
  FROM orders
) WHERE price_rank <= 3
""",
    "priority_rollup": """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "customer_set_ops": """
SELECT DISTINCT o_custkey AS c_custkey FROM orders
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
EXCEPT ALL
SELECT c_custkey FROM customer WHERE c_acctbal < 0
""",
    "customers_without_orders": """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
    "part_scalar_functions": """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substr(p_type, 1, 5) AS type_prefix,
       p_name LIKE '%al%' AS has_al,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       round(ln(p_retailprice + 1), 6) AS price_log,
       CAST(p_size % 7 AS BIGINT) AS size_mod,
       CASE WHEN p_retailprice > 1500 THEN 'premium'
            WHEN p_retailprice > 900 THEN 'standard'
            ELSE 'budget' END AS tier
FROM part
""",
    "distinct_suppliers": """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    "user_sessions": """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       epoch_ms(min(ts)) AS session_start_ms,
       epoch_ms(max(ts)) AS session_last_ms,
       count(*) AS n_events,
       round(sum(value), 6) AS session_value
FROM sess
GROUP BY user_id, session_seq
""",
}


def q_nation_customer_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): per nation, the sorted
    customer-name roster — collect_list + array_sort + array_join stays
    entirely JVM-side and matches SQL string_agg with ORDER BY."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (cust.join(nation, cust.c_nationkey == nation.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 F.array_join(F.array_sort(F.collect_list("c_name")), "|")
                 .alias("roster")))


QUERIES["nation_customer_list"] = q_nation_customer_list

ORACLE["nation_customer_list"] = """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_customers,
       string_agg(c.c_name, '|' ORDER BY c.c_name) AS roster
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# ---- RFM customer segmentation -----------------------------------------


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days since last order, against the
    table's own max date), frequency (order count) and monetary (total
    spend), each scored into quintiles — the classic marketing/feature
    segmentation. Quintiles are ntile(5) with fully deterministic
    ordering (metric, then custkey), so both engines cut identically.
    One scan, one aggregation, three window passes over the same
    customer-level frame, max-date as a broadcast scalar."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("maxd"))
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count(F.lit(1)).alias("frequency"),
                     F.round(F.sum("o_totalprice"), 2).alias("monetary")))
    d = (per_cust.crossJoin(F.broadcast(maxd))
         .withColumn("recency_days",
                     F.datediff("maxd", "last_order").cast("long")))
    r_w = Window.orderBy(F.asc("recency_days"), "o_custkey")
    f_w = Window.orderBy(F.desc("frequency"), "o_custkey")
    m_w = Window.orderBy(F.desc("monetary"), "o_custkey")
    return d.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
        F.ntile(5).over(r_w).cast("int").alias("r_score"),
        F.ntile(5).over(f_w).cast("int").alias("f_score"),
        F.ntile(5).over(m_w).cast("int").alias("m_score"),
    )


QUERIES["customer_rfm"] = q_customer_rfm

ORACLE["customer_rfm"] = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
),
d AS (
  SELECT *,
         datediff('day', last_order,
                  (SELECT max(o_orderdate) FROM orders)) AS recency_days
  FROM per_cust
)
SELECT o_custkey AS custkey,
       CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       monetary,
       CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey) AS INT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_score
FROM d
"""
