"""Hard TPC-H join shapes (q2/q8/q17/q21/q22 style) — correlated
subqueries, conditional-aggregate ratios, and multi-EXISTS anti-join
chains, adapted to the driver's schema (lineitem carries the
part-supplier link; there is no partsupp table).

These stress join PLANNING beyond the star joins in queries/relational:
the q2 shape needs a per-group minimum pushed back through an equi-join
(not a cartesian); the q8 shape is a two-level conditional aggregate
over a 5-way join with every dimension broadcast; the q21 shape chains
a semi join and an anti join against two different filtered self-views
of lineitem. Plan assertions live in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.tables import load_table

REGION = "ASIA"
NATION = "CHINA"
PART_TYPE_SUFFIX = "BRASS"


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: for each BRASS-type part, the supplier offering it at
    the region's minimum price. The correlated scalar subquery
    (min price per part within the region) becomes a groupBy + equi-join
    back on (partkey, price); region/nation/supplier dims broadcast.
    Ties (same part, same min price, several suppliers) keep every
    winning supplier — like the SQL correlated form."""
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    li = load_table(spark, sf_dir, "lineitem")

    asia_nations = (nation.join(
        F.broadcast(region.where(F.col("r_name") == REGION)),
        nation.n_regionkey == region.r_regionkey))
    asia_suppliers = (supplier.join(
        F.broadcast(asia_nations.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey")))
    brass = part.where(F.col("p_type").endswith(PART_TYPE_SUFFIX))

    offers = (li.join(F.broadcast(asia_suppliers.select(
                  "s_suppkey", "s_name", "s_acctbal", "n_name")),
                  li.l_suppkey == F.col("s_suppkey"))
              .join(F.broadcast(brass.select("p_partkey", "p_type")),
                    li.l_partkey == F.col("p_partkey"))
              .select("p_partkey", "p_type", "s_suppkey", "s_name",
                      "s_acctbal", "n_name",
                      F.col("l_extendedprice").alias("price")))
    min_price = offers.groupBy("p_partkey").agg(
        F.min("price").alias("min_price"))
    return (offers.join(min_price, "p_partkey")
            .where(F.col("price") == F.col("min_price"))
            .select(F.col("p_partkey").alias("partkey"), "p_type",
                    F.col("s_suppkey").alias("suppkey"), "s_name",
                    F.round("s_acctbal", 2).alias("acctbal"),
                    F.col("n_name").alias("nation"),
                    F.round("min_price", 2).alias("min_price"))
            .distinct())


def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 shape: NATION's share of revenue among REGION customers per
    order year — a two-level conditional aggregate over a 5-way join
    (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, supplier nation
    attached for the numerator). Share floor-quantized at 6 decimals
    (repo ratio convention — summation-order differences must not flip
    a rounding boundary)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supplier = load_table(spark, sf_dir, "supplier")

    cust_region = (customer
                   .join(F.broadcast(nation),
                         customer.c_nationkey == nation.n_nationkey)
                   .join(F.broadcast(region.where(F.col("r_name") == REGION)),
                         nation.n_regionkey == region.r_regionkey)
                   .select("c_custkey"))
    supp_nation = (supplier
                   .join(F.broadcast(nation.select(
                       F.col("n_nationkey").alias("sn_key"),
                       F.col("n_name").alias("supp_nation"))),
                       supplier.s_nationkey == F.col("sn_key"))
                   .select("s_suppkey", "supp_nation"))
    joined = (li
              .join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(cust_region),
                    orders.o_custkey == F.col("c_custkey"), "left_semi")
              .join(F.broadcast(supp_nation),
                    li.l_suppkey == F.col("s_suppkey")))
    per_year = (joined
                .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
                .agg(F.sum(_revenue()).alias("total_rev"),
                     F.sum(F.when(F.col("supp_nation") == NATION,
                                  _revenue()).otherwise(0.0))
                     .alias("nation_rev")))
    return per_year.select(
        "yr",
        F.round("total_rev", 2).alias("total_rev"),
        F.round("nation_rev", 2).alias("nation_rev"),
        (F.floor(F.col("nation_rev") / F.col("total_rev") * 1_000_000)
         / 1_000_000).alias("share"))


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape: suppliers who returned a line (l_returnflag='R') in a
    finished multi-supplier order where NO other supplier returned one —
    EXISTS (another supplier in the order) AND NOT EXISTS (another
    supplier with a returned line). The two correlated EXISTS become a
    semi join and an anti join against filtered self-views of lineitem,
    correlated on orderkey with the supplier inequality in the join
    condition."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")

    finished = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (li.where(F.col("l_returnflag") == "R")
          .join(finished, li.l_orderkey == finished.o_orderkey, "left_semi")
          .select("l_orderkey", "l_suppkey"))
    l2 = li.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_suppkey").alias("s2"))
    l3 = (li.where(F.col("l_returnflag") == "R")
          .select(F.col("l_orderkey").alias("o3"),
                  F.col("l_suppkey").alias("s3")))
    exists_other = l1.join(
        l2, (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_suppkey") != F.col("s2")), "left_semi")
    not_exists_other_returned = exists_other.join(
        l3, (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3")), "left_anti")
    return (not_exists_other_returned
            .groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey").alias("suppkey"), "s_name", "numwait"))


BRAND = "Brand#1"


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: yearly revenue lost to small orders — lineitems of one
    brand's parts whose quantity is below 20% of that PART's average
    quantity. The correlated scalar subquery decorrelates into a
    per-part aggregate joined back onto the lineitem stream; the brand
    filter broadcasts FIRST so both the aggregate and the probe run
    over the brand's lineitems only (the subquery's correlation key is
    a part attribute, so pre-filtering is semantics-preserving)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    brand_parts = (part.where(F.col("p_brand") == BRAND)
                   .select("p_partkey"))
    li_b = li.join(F.broadcast(brand_parts),
                   li.l_partkey == F.col("p_partkey")).drop("p_partkey")
    lim = li_b.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit"))
    small = (li_b.join(F.broadcast(lim), "l_partkey")
             .where(F.col("l_quantity") < F.col("qty_limit")))
    return small.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 6)
        .alias("avg_yearly"))


IDLE_CUTOFF = "2000-01-01"


def q_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: customers with above-average positive balance and no
    RECENT orders (none since IDLE_CUTOFF) — a global scalar subquery
    (the average) attached as a broadcast single-row crossJoin, then an
    anti join against the date-filtered orders (the filter pushes to
    the orders scan), aggregated per market segment."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    avg_bal = (customer.where(F.col("c_acctbal") > 0)
               .agg(F.round(
                   F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1)), 6)
                   .alias("avg_bal")))
    rich = (customer.crossJoin(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("avg_bal")))
    recent = (orders
              .where(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("timestamp"))
              .select("o_custkey"))
    idle = rich.join(recent, rich.c_custkey == F.col("o_custkey"),
                     "left_anti")
    return (idle.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("total_bal")))


QUERIES = {
    "min_cost_supplier": q_min_cost_supplier,
    "nation_market_share": q_nation_market_share,
    "waiting_suppliers": q_waiting_suppliers,
    "small_quantity_revenue": q_small_quantity_revenue,
    "rich_idle_customers": q_rich_idle_customers,
}

ORACLE = {
    "min_cost_supplier": f"""
WITH offers AS (
  SELECT p.p_partkey, p.p_type, s.s_suppkey, s.s_name, s.s_acctbal,
         n.n_name, l.l_extendedprice AS price
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = '{REGION}'
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type LIKE '%{PART_TYPE_SUFFIX}'
)
SELECT DISTINCT p_partkey AS partkey, p_type, s_suppkey AS suppkey,
       s_name, round(s_acctbal, 2) AS acctbal, n_name AS nation,
       round(price, 2) AS min_price
FROM offers o
WHERE price = (SELECT min(price) FROM offers i
               WHERE i.p_partkey = o.p_partkey)
""",
    "nation_market_share": f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_rev,
       round(sum(CASE WHEN sn.n_name = '{NATION}'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0.0 END), 2) AS nation_rev,
       floor(sum(CASE WHEN sn.n_name = '{NATION}'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)) * 1000000)
         / 1000000 AS share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE o.o_custkey IN (
  SELECT c.c_custkey
  FROM customer c
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{REGION}')
GROUP BY year(o.o_orderdate)
""",
    "waiting_suppliers": """
SELECT l1.l_suppkey AS suppkey, s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l1.l_orderkey
                AND o.o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY l1.l_suppkey, s.s_name
""",
    "small_quantity_revenue": f"""
WITH li_b AS (
  SELECT l.* FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = '{BRAND}'
), lim AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_limit
  FROM li_b GROUP BY l_partkey
)
SELECT count(*) AS n_lines,
       round(round(sum(l.l_extendedprice), 2) / 7.0, 6) AS avg_yearly
FROM li_b l JOIN lim ON l.l_partkey = lim.l_partkey
WHERE l.l_quantity < lim.qty_limit
""",
    "rich_idle_customers": f"""
WITH avg_bal AS (
  SELECT round(round(sum(c_acctbal), 2) / count(*), 6) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = customer.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF} 00:00:00')
GROUP BY c_mktsegment
""",
}


# ---- q15 shape: argmax against an aggregated revenue view ---------------

REV_START = "1996-01-01"
REV_END = "1996-04-01"


def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: total revenue per supplier over one quarter, keep the
    supplier(s) achieving the global maximum. The correlated
    `= (SELECT max(...) FROM view)` becomes a 1-row aggregate
    crossJoin-broadcast back onto the view — no driver action, no
    second scan of lineitem (the view is reused under the max)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (li.where((F.col("l_shipdate") >= REV_START)
                    & (F.col("l_shipdate") < REV_END))
           .groupBy("l_suppkey")
           .agg(F.sum(_revenue()).alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("_max_rev"))
    top = (rev.crossJoin(F.broadcast(mx))
           .where(F.col("total_rev") == F.col("_max_rev")))
    return (top.join(F.broadcast(supplier),
                     top.l_suppkey == supplier.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.round("total_rev", 2).alias("total_rev")))


QUERIES["top_revenue_supplier"] = q_top_revenue_supplier

ORACLE["top_revenue_supplier"] = f"""
WITH rev AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= '{REV_START}' AND l_shipdate < '{REV_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""


# ---- q20 shape: IN-subquery over a correlated aggregate -----------------

DOM_FACTOR = 2.0   # supplier ships > 2x the per-supplier average for a part
DOM_MIN_PARTS = 4  # ...on at least this many parts


def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape (no partsupp table in this schema): suppliers that ship
    more than DOM_FACTOR times the per-supplier average quantity of a
    small part (p_size <= 10), on at least DOM_MIN_PARTS distinct parts.
    The nested `s_suppkey IN (SELECT ... GROUP BY ... HAVING ...)` with
    a correlated per-part aggregate becomes per-(part, supplier) and
    per-part aggregates joined shuffle-aligned on partkey, a per-
    supplier dominance count, then a semi join. The avg-relative
    dominance criterion is scale-stable (a fixed share threshold decays
    as supplier count per part grows with SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    small = part.where(F.col("p_size") <= 10).select("p_partkey")
    shipped = li.join(F.broadcast(small),
                      li.l_partkey == F.col("p_partkey"))
    by_ps = shipped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty"))
    by_p = by_ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"),
        F.count(F.lit(1)).alias("n_supp"))
    dominant = (by_ps.join(by_p, "l_partkey")
                .where(F.col("supp_qty") * F.col("n_supp")
                       > F.lit(DOM_FACTOR) * F.col("part_qty"))
                .groupBy("l_suppkey")
                .agg(F.count(F.lit(1)).alias("n_dominant"))
                .where(F.col("n_dominant") >= DOM_MIN_PARTS))
    return (supplier.join(dominant,
                          supplier.s_suppkey == dominant.l_suppkey,
                          "left_semi")
            .select("s_suppkey", "s_name", "s_nationkey"))


QUERIES["dominant_part_suppliers"] = q_dominant_part_suppliers

ORACLE["dominant_part_suppliers"] = f"""
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
  WITH by_ps AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
    GROUP BY l_partkey, l_suppkey
  ),
  by_p AS (
    SELECT l_partkey, sum(supp_qty) AS part_qty, count(*) AS n_supp
    FROM by_ps GROUP BY l_partkey
  )
  SELECT l_suppkey
  FROM by_ps JOIN by_p USING (l_partkey)
  WHERE supp_qty * n_supp > {DOM_FACTOR} * part_qty
  GROUP BY l_suppkey
  HAVING count(*) >= {DOM_MIN_PARTS}
)
"""


# ---- classic TPC-H shapes q3/q7/q9/q13/q14/q16/q19 (adapted) -------------
#
# Adapted to the driver schema: no partsupp (the part-supplier link
# rides on lineitem), no l_shipmode/o_shippriority/comments, nations
# named NATION_<i>. Money aggregates follow the module's
# round(sum(...), 2) convention (the star-join tier's proven contract).

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOPN = 10


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 shape: top unshipped-revenue orders for one market segment —
    two date-asymmetric filters (orders placed BEFORE the cutoff,
    lineitems shipped AFTER it), 3-way join, per-order revenue, global
    top-N. The segment filter prunes the customer dim before its join;
    the top-N is a single TakeOrdered on the aggregated frame (never a
    full sort at scale). Ties are impossible to hash-break on revenue
    alone, so the sort key includes the order key."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    c = customer.where(F.col("c_mktsegment") == Q3_SEGMENT)
    o = orders.where(F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp"))
    li = lineitem.where(
        F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderdate"),
                     F.asc("l_orderkey"))
            .limit(Q3_TOPN)
            .select("l_orderkey", "revenue",
                    F.unix_millis("o_orderdate").alias("orderdate_ms"),
                    "o_orderpriority"))


QUERIES["shipping_priority"] = q_shipping_priority

ORACLE["shipping_priority"] = f"""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       epoch_ms(o_orderdate) AS orderdate_ms,
       o_orderpriority
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT {Q3_TOPN}
"""


Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 shape: bilateral trade volume between two nations by ship
    year — supplier nation on the lineitem side, customer nation on the
    order side, keeping only the two cross pairs (A->B, B->A). Both
    nation-keyed dim chains broadcast; the fact table shuffles once for
    the (nation, nation, year) aggregate."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    s = supplier.join(F.broadcast(n1),
                      supplier.s_nationkey == n1.s_nk)
    c = customer.join(F.broadcast(n2),
                      customer.c_nationkey == n2.c_nk)
    pair_ok = (
        ((F.col("supp_nation") == Q7_NATION_A)
         & (F.col("cust_nation") == Q7_NATION_B))
        | ((F.col("supp_nation") == Q7_NATION_B)
           & (F.col("cust_nation") == Q7_NATION_A)))
    return (lineitem
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(s.select("s_suppkey", "supp_nation")),
                  lineitem.l_suppkey == F.col("s_suppkey"))
            .join(F.broadcast(c.select("c_custkey", "cust_nation")),
                  orders.o_custkey == F.col("c_custkey"))
            .where(pair_ok)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
            .select("supp_nation", "cust_nation",
                    F.col("l_year").cast("long").alias("l_year"), "revenue"))


QUERIES["volume_shipping"] = q_volume_shipping

ORACLE["volume_shipping"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
   OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


Q9_COLOR = "red "
Q9_COST_FRACTION = 0.10


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 shape: product-line profit by supplier nation and order year.
    partsupp's supplycost is adapted to a retail-price fraction (the
    schema has no partsupp); the analytical shape — a name-pattern part
    filter driving a 5-way join into a two-key aggregate — is intact."""
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    p = part.where(F.col("p_name").startswith(Q9_COLOR)).select(
        "p_partkey", "p_retailprice")
    s = (supplier.join(F.broadcast(nation),
                       supplier.s_nationkey == nation.n_nationkey)
         .select("s_suppkey", F.col("n_name").alias("nation")))
    profit = (_revenue()
              - F.col("p_retailprice") * F.col("l_quantity")
              * F.lit(Q9_COST_FRACTION))
    return (lineitem
            .join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
            .join(F.broadcast(s), lineitem.l_suppkey == F.col("s_suppkey"))
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("nation", F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
            .select("nation", F.col("o_year").cast("long").alias("o_year"),
                    "sum_profit"))


QUERIES["nation_profit"] = q_nation_profit

ORACLE["nation_profit"] = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity * {Q9_COST_FRACTION}), 2)
         AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '{Q9_COLOR}%'
GROUP BY n_name, year(o_orderdate)
"""


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: the distribution of per-customer order counts,
    INCLUDING the zero bucket (left join, not inner — the classic trap).
    Two cascaded aggregates; all-integer output, exact cross-engine."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .select(F.col("c_count").cast("long").alias("c_count"),
                    F.col("custdist").cast("long").alias("custdist")))


QUERIES["customer_order_distribution"] = q_customer_order_distribution

ORACLE["customer_order_distribution"] = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
"""


PROMO_TYPE = "PROMO"


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape per ship month: promo-type revenue share — a
    conditional aggregate over a broadcast part join. The ratio of two
    same-scan sums computes in one aggregate (no self-join)."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    promo_rev = F.when(F.col("p_type") == PROMO_TYPE, _revenue()) \
        .otherwise(F.lit(0.0))
    return (lineitem
            .join(F.broadcast(part.select("p_partkey", "p_type")),
                  lineitem.l_partkey == part.p_partkey)
            .groupBy(F.unix_millis(F.date_trunc("month", "l_shipdate"))
                     .alias("month_ms"))
            .agg(F.round(F.lit(100.0) * F.round(F.sum(promo_rev), 2)
                         / F.round(F.sum(_revenue()), 2), 6)
                 .alias("promo_share"),
                 F.round(F.sum(promo_rev), 2).alias("promo_revenue")))


QUERIES["promo_revenue"] = q_promo_revenue

ORACLE["promo_revenue"] = f"""
SELECT epoch_ms(date_trunc('month', l_shipdate)) AS month_ms,
       round(100.0 * round(sum(CASE WHEN p_type = '{PROMO_TYPE}'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END), 2)
             / round(sum(l_extendedprice * (1 - l_discount)), 2), 6)
           AS promo_share,
       round(sum(CASE WHEN p_type = '{PROMO_TYPE}'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END), 2) AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY date_trunc('month', l_shipdate)
"""


Q16_EXCLUDE_BRAND = "Brand#5"


def q_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape: distinct-supplier breadth per (brand, type, size)
    part class, excluding one brand — the part-supplier link rides on
    lineitem (no partsupp in this schema). count(DISTINCT) over a
    broadcast-dim join; all-integer output."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    p = part.where(F.col("p_brand") != Q16_EXCLUDE_BRAND)
    return (lineitem
            .join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .select("p_brand", "p_type",
                    F.col("p_size").cast("long").alias("p_size"),
                    F.col("supplier_cnt").cast("long").alias("supplier_cnt")))


QUERIES["brand_supplier_counts"] = q_brand_supplier_counts

ORACLE["brand_supplier_counts"] = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_EXCLUDE_BRAND}'
GROUP BY p_brand, p_type, p_size
"""


Q19_ARMS = [("Brand#3", 15, 1, 11), ("Brand#14", 25, 10, 20),
            ("Brand#21", 35, 20, 30)]


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19 shape: revenue under a 3-arm disjunctive brand/size/quantity
    predicate — the optimizer-stress classic where the OR must still
    push the part filter into the broadcast side (each arm constrains
    both tables). Single-row output."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    arm = None
    for brand, max_size, qlo, qhi in Q19_ARMS:
        a = ((F.col("p_brand") == brand)
             & (F.col("p_size") >= 1) & (F.col("p_size") <= max_size)
             & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi))
        arm = a if arm is None else (arm | a)
    return (lineitem
            .join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                  lineitem.l_partkey == part.p_partkey)
            .where(arm)
            .agg(F.round(F.sum(_revenue()), 2).alias("revenue"),
                 F.count(F.lit(1)).cast("long").alias("n_items")))


QUERIES["disjunctive_revenue"] = q_disjunctive_revenue

_Q19_PRED = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {ms}"
    f" AND l_quantity BETWEEN {lo} AND {hi})"
    for b, ms, lo, hi in Q19_ARMS)

ORACLE["disjunctive_revenue"] = f"""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_PRED}
"""


# ---- q18: large-volume customers -------------------------------------------

Q18_QTY = 250.0  # ~top 1-2% of orders by total quantity at every sf


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: customers holding an order whose TOTAL line quantity
    exceeds a threshold — the classic aggregated-HAVING IN-subquery.
    Spark plan: the subquery becomes a grouped filter semi-joined back
    onto the fact; the per-order quantity is then re-aggregated with
    the customer attached. Top-100 by (o_totalprice DESC, o_orderdate,
    o_orderkey) via TakeOrdered — never a full sort. Quantities are
    integral doubles, so sum/threshold comparisons are exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("total_qty"))
           .where(F.col("total_qty") > Q18_QTY))
    return (orders.join(big, orders.o_orderkey == big.l_orderkey)
            .join(customer, orders.o_custkey == customer.c_custkey)
            .select("c_name",
                    F.col("c_custkey").cast("long").alias("c_custkey"),
                    F.col("o_orderkey").cast("long").alias("o_orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    F.col("total_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"),
                     F.asc("o_orderkey"))
            .limit(100))


QUERIES["large_volume_customers"] = q_large_volume_customers

ORACLE["large_volume_customers"] = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > {Q18_QTY}
)
SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       b.total_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate ASC, o.o_orderkey ASC
LIMIT 100
"""


# ---- q10: returned-item revenue report --------------------------------------

Q10_QUARTER_START = "1996-01-01"
Q10_QUARTER_END = "1996-04-01"


def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10 shape: customers who returned items in a quarter, ranked by
    lost revenue — fact filtered on two dimensions (order date range,
    returnflag), customer + nation broadcast, top-20 TakeOrdered.
    Per-line revenue is quantized to the exact basis-point lattice
    (price 2dp x discount-complement 2dp = 4 decimals, exactly
    integer-representable) and summed as BIGINT — no float summation
    can sit on a rounding boundary (a round(sum, 2) variant mismatched
    the oracle by one cent on a true .xx5 sum), the same integer-money
    discipline as revenue_pareto."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    rev_bp = F.round(_revenue() * 10_000).cast("long")
    o = orders.where(
        (F.col("o_orderdate") >= Q10_QUARTER_START)
        & (F.col("o_orderdate") < Q10_QUARTER_END))
    r = (li.where(F.col("l_returnflag") == "R")
         .join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(customer), o.o_custkey == customer.c_custkey)
         .join(F.broadcast(nation),
               customer.c_nationkey == nation.n_nationkey)
         .groupBy("c_custkey", "c_name", "n_name")
         .agg(F.sum(rev_bp).alias("rev_bp"),
              F.count(F.lit(1)).cast("long").alias("n_lines")))
    return (r.select(F.col("c_custkey").cast("long").alias("c_custkey"),
                     "c_name", F.col("n_name").alias("nation"),
                     (F.col("rev_bp") / 10_000).alias("revenue"),
                     "n_lines")
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


QUERIES["returned_item_report"] = q_returned_item_report

ORACLE["returned_item_report"] = f"""
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
       n.n_name AS nation,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                           * 10000) AS BIGINT)) AS BIGINT)
         / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '{Q10_QUARTER_START}'
  AND o.o_orderdate < DATE '{Q10_QUARTER_END}'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---- q21: waiting suppliers (the full multi-EXISTS chain) -------------------

Q21_LATE_DAYS = 60


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full TPC-H q21 — suppliers whose late line was the ONLY late
    line in a finished multi-supplier order, ranked by how many such
    lines they have (top-100). Adaptations to the driver's schema,
    stated: lineitem has no commit/receipt dates, so "late" is
    l_shipdate more than Q21_LATE_DAYS past the order date (needs the
    orders join q21 has anyway); and the single-nation filter of stock
    q21 is vacuous at small SF here (waiting suppliers land in
    different nations per SF in this generator), so the broadcast
    nation dim becomes an output attribute instead of a predicate —
    same plan shape, non-vacuous at every SF.

    SPARK-FIRST SHAPE (reference q21 shape: two correlated EXISTS →
    two lineitem self-joins, `q_waiting_suppliers` keeps that form):
    the exists/not-exists pair decorrelates into ONE pass of per-order
    aggregates — per (order, supplier) count late lines (map-side
    combined, so the shuffle carries one row per order-supplier pair,
    not per line), then per order count suppliers and late suppliers
    with a window at that already-reduced grain (one more exchange of
    the TINY combined frame — deliberately NOT a pre-repartition by
    order key, which would shuffle raw lines without combining).
    A supplier "waits" in an order iff it is late there,
    the order has >= 2 distinct suppliers (EXISTS), and exactly one
    distinct late supplier — itself (NOT EXISTS). lineitem is scanned
    ONCE (the self-join form scans it three times), dims broadcast,
    and the oracle below runs the INDEPENDENT classic correlated
    EXISTS formulation, so the hash match also proves the
    decorrelation. Top-100 by (numwait DESC, s_name) — a total order,
    TakeOrdered, never a full sort."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    fin = (orders.where(F.col("o_orderstatus") == "F")
           .select("o_orderkey", "o_orderdate"))
    late = (F.col("l_shipdate")
            > F.col("o_orderdate")
            + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")).cast("long")
    per_supp = (li.select("l_orderkey", "l_suppkey", "l_shipdate")
                .join(fin, li.l_orderkey == fin.o_orderkey)
                .groupBy("l_orderkey", "l_suppkey")
                .agg(F.sum(late).alias("n_late")))
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_suppkey", "n_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum((F.col("n_late") > 0).cast("long")).over(w)
        .alias("n_late_supp"))
    waits = (flagged.where((F.col("n_late") > 0)
                           & (F.col("n_supp") >= 2)
                           & (F.col("n_late_supp") == 1))
             .groupBy("l_suppkey")
             .agg(F.sum("n_late").cast("long").alias("numwait")))
    return (waits
            .join(F.broadcast(supplier.select(
                "s_suppkey", "s_name", "s_nationkey")),
                waits.l_suppkey == F.col("s_suppkey"))
            .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", F.col("n_name").alias("nation"), "numwait")
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(100))


QUERIES["tpch_q21"] = q_tpch_q21

# classic correlated EXISTS / NOT EXISTS formulation — independent of
# the Spark side's single-pass decorrelation, so the hash match proves
# the rewrite, not just the arithmetic
ORACLE["tpch_q21"] = f"""
WITH fin AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
)
SELECT s.s_name, n.n_name AS nation, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN fin f ON l1.l_orderkey = f.o_orderkey
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE l1.l_shipdate > f.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN fin f3 ON l3.l_orderkey = f3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate
                        > f3.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY)
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 100
"""


# ---- q4: order-priority checking --------------------------------------------

Q4_QUARTER_START = "1996-01-01"
Q4_QUARTER_END = "1996-04-01"
Q4_LATE_DAYS = 30


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: per order priority, how many of a quarter's
    orders contain at least one LATE line — the correlated EXISTS whose
    subquery references BOTH tables' columns (l_shipdate vs the outer
    o_orderdate; stock q4 compares commit vs receipt dates, which this
    schema lacks — adaptation stated).

    SPARK-FIRST SHAPE: EXISTS(line later than o_orderdate + D) is
    equivalent to max(l_shipdate) per order > o_orderdate + D, so the
    correlated EXISTS decorrelates into ONE map-side-combined scalar
    aggregate — the shuffle carries one (orderkey, max_ship) row per
    order instead of every line (the semi-join form sort-merges the
    FULL fact). A ship-date prefilter is pushed to the parquet scan:
    any qualifying line ships after quarter_start + D, because the
    outer order's date is >= quarter_start — so row groups outside the
    window never leave storage. The oracle runs the INDEPENDENT
    classic correlated EXISTS, so the hash match proves the rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    o = orders.where(
        (F.col("o_orderdate") >= Q4_QUARTER_START)
        & (F.col("o_orderdate") < Q4_QUARTER_END))
    ship_floor = (F.lit(Q4_QUARTER_START).cast("timestamp")
                  + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS"))
    mx = (li.where(F.col("l_shipdate") > ship_floor)
          .groupBy("l_orderkey")
          .agg(F.max("l_shipdate").alias("max_ship")))
    late = (F.col("max_ship")
            > F.col("o_orderdate")
            + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS"))
    return (o.join(mx, o.o_orderkey == mx.l_orderkey)
            .where(late)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
            .orderBy("o_orderpriority"))


QUERIES["order_priority_check"] = q_order_priority_check

ORACLE["order_priority_check"] = f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '{Q4_QUARTER_START}'
  AND o.o_orderdate < DATE '{Q4_QUARTER_END}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate
                    > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""
