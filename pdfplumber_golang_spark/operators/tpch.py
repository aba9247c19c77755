"""Classic relational queries over the driver's TPC-H-ish tables.

All 22 TPC-H queries run over the host tables (lineitem/orders/customer/
supplier/part/nation/region), plus a ROLLUP variant of Q1.  Every
canonical shape is covered: scan-agg (Q1), join+top-k (Q3/Q10), star
joins (Q5/Q7/Q8), conditional-sum ratios (Q8/Q14), outer-join count
distribution (Q13), scalar-max join (Q15), correlated per-group scalar
(Q2/Q17), group-vs-global threshold (Q11), HAVING semi (Q18/Q20),
disjunctive join predicate (Q19), stacked EXISTS/NOT-EXISTS (Q21), anti
join with lazy global threshold (Q22), distinct-count with blacklist
anti (Q16), derived-date conditional counts (Q12).  Four queries need
columns the host schema does not carry (partsupp/supplycost/availqty
for Q2/Q11/Q16, shipmode + commit/receipt dates for Q12); those
relations are DERIVED deterministically from host keys (see the derived
relations section) with the identical formulas restated in the oracles,
so the query shapes are fully real; Q9 and Q20 run adapted (profit =
discounted revenue; availqty = shipped qty).

Dimension sides broadcast everywhere; facts shuffle only on join keys.

Cross-engine float determinism: money columns are DOUBLEs holding exact
cent values, discounts/taxes exact integer percents (verified in tests).
All sums run in integer cents (cent·percent·percent for the charge), so
Spark's partition-parallel aggregation and DuckDB's serial one produce
bit-identical totals — float sums would be addition-order-dependent and
hash-unstable.  Division back to currency happens once, on the exact
integer, at projection time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Q1_CUTOFF = "2000-09-02"
Q3_DATE = "1997-03-15"
Q3_SEGMENT = "BUILDING"
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1997-01-01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str):
    return F.round(F.col(col) * 100).cast("long")


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: one scan, map-side-combinable agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")
    )
    ep, d, t = _cents("l_extendedprice"), _pct("l_discount"), _pct("l_tax")
    rows = li.select(
        "l_returnflag", "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        ep.alias("ep_c"),
        (ep * (100 - d)).alias("disc_c"),
        (ep * (100 - d) * (100 + t)).alias("charge_c"),
        d.alias("d_pct"),
    )
    return (
        rows.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sum_qty"),
            F.sum("ep_c").alias("s_ep"),
            F.sum("disc_c").alias("s_disc"),
            F.sum("charge_c").alias("s_charge"),
            F.sum("d_pct").alias("s_d"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            F.col("sum_qty").cast("long").alias("sum_qty"),
            F.round(F.col("s_ep") / 100.0, 2).alias("sum_base_price"),
            F.round(F.col("s_disc") / 10000.0, 2).alias("sum_disc_price"),
            F.round(F.col("s_charge") / 1000000.0, 2).alias("sum_charge"),
            F.round(F.col("sum_qty") / F.col("count_order"), 4).alias("avg_qty"),
            F.round(F.col("s_ep") / 100.0 / F.col("count_order"), 4).alias("avg_price"),
            F.round(F.col("s_d") / 100.0 / F.col("count_order"), 4).alias("avg_disc"),
            F.col("count_order").cast("long").alias("count_order"),
        )
    )


def tpch_q1_oracle() -> str:
    return f"""
WITH rows_ AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep_c,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d_pct,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS t_pct
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       ROUND(SUM(ep_c) / 100.0, 2) AS sum_base_price,
       ROUND(SUM(ep_c * (100 - d_pct)) / 10000.0, 2) AS sum_disc_price,
       ROUND(SUM(ep_c * (100 - d_pct) * (100 + t_pct)) / 1000000.0, 2)
         AS sum_charge,
       ROUND(SUM(qty)::DOUBLE / COUNT(*), 4) AS avg_qty,
       ROUND(SUM(ep_c) / 100.0 / COUNT(*), 4) AS avg_price,
       ROUND(SUM(d_pct) / 100.0 / COUNT(*), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM rows_ GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: broadcast the filtered customer dim, shuffle only
    order/lineitem keys; deterministic top-10 via (revenue, orderkey)."""
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    rev = (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_c")
    return (
        li.select("l_orderkey", rev)
        .join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("rev_c").alias("s_rev"))
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.round(F.col("s_rev") / 10000.0, 2).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def tpch_q3_oracle() -> str:
    return f"""
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0, 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: the 6-way star join — every dimension side
    broadcast (region/nation/supplier/customer), the fact tables shuffle
    on their join keys only."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("cn_key"), "n_name")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_c"),
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_nationkey") == F.col("cn_key"))
        .groupBy("n_name")
        .agg(F.sum("rev_c").alias("s_rev"))
        .select(
            "n_name", F.round(F.col("s_rev") / 10000.0, 2).alias("revenue")
        )
    )


def tpch_q5_oracle() -> str:
    return f"""
SELECT n_name,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0, 2) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n_name
"""


Q6_FROM, Q6_TO = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 5, 7   # integer percents (0.05..0.07)
Q6_MAX_QTY = 24

Q18_MIN_QTY = 150


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: pure filter + single-value agg — the
    predicate-pushdown showcase (every filter reaches the parquet scan)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp"))
        & (F.col("l_quantity") < Q6_MAX_QTY)
    )
    d = _pct("l_discount")
    rev = (_cents("l_extendedprice") * d).alias("rev_c")
    return (
        li.select(rev, d.alias("d_pct"))
        .where((F.col("d_pct") >= Q6_DISC_LO) & (F.col("d_pct") <= Q6_DISC_HI))
        .agg(F.round(F.sum("rev_c") / 10000.0, 2).alias("revenue"))
    )


def tpch_q6_oracle() -> str:
    return f"""
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0, 2)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q6_TO} 00:00:00'
  AND l_quantity < {Q6_MAX_QTY}
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
"""


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: HAVING over the fact agg, then a semi-join
    back — the agg runs BEFORE any join, so only qualifying orderkeys
    (a tiny set) reach the join stage."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > Q18_MIN_QTY)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.col("o_custkey").cast("long").alias("c_custkey"),
            F.col("l_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


def tpch_q18_oracle() -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q18_MIN_QTY}
)
SELECT c_name, CAST(o_custkey AS BIGINT) AS c_custkey,
       CAST(l_orderkey AS BIGINT) AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


Q14_FROM, Q14_TO = "1996-09-01", "1996-10-01"


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect: promo revenue share — lineitem x part broadcast
    join with a conditional integer-cents sum (PROMO parts vs all).
    Completes coverage of every host table."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp"))
    )
    rev = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    j = li.select("l_partkey", rev.alias("rev_c")).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(0)
        ).alias("promo_c"),
        F.sum("rev_c").alias("total_c"),
    )
    return agg.select(
        F.round(100.0 * F.col("promo_c") / F.col("total_c"), 4).alias(
            "promo_revenue_pct"
        ),
        F.round(F.col("total_c") / 10000.0, 2).alias("total_revenue"),
    )


def tpch_q14_oracle() -> str:
    return f"""
WITH j AS (
  SELECT p_type,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q14_TO} 00:00:00'
)
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END)
             / SUM(rev_c), 4) AS promo_revenue_pct,
       ROUND(SUM(rev_c) / 10000.0, 2) AS total_revenue
FROM j
"""


Q4_FROM, Q4_TO = "1996-01-01", "1996-04-01"


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking, adapted to this schema (lineitem carries
    only l_shipdate): count orders per priority having AT LEAST ONE line
    shipped after the order date — the EXISTS / LEFT-SEMI join shape
    (the probe side deduplicates for free; no fan-out on multi-line
    orders)."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_TO).cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


def tpch_q4_oracle() -> str:
    return f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_FROM} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q4_TO} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


Q22_SINCE = "2000-01-01"


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity, adapted: above-average-balance customers
    with NO orders since Q22_SINCE — the NOT-EXISTS / LEFT-ANTI join
    shape, grouped by nation (every customer has SOME order in this
    fixture, so the recency window is what makes the anti-join
    discriminate).

    The above-average threshold is EXACT integer arithmetic: customer
    qualifies iff ``bal_c * n_all > sum_c`` (all integer cents) — a
    floating avg() would be addition-order-dependent and Spark's
    partition-parallel sum vs DuckDB's serial one can flip customers
    sitting at the boundary by a ULP.  The 1-row corpus aggregate rides a
    broadcast join (lazy; no eager ``collect`` job in the plan)."""
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", cents.alias("bal_c")
    )
    stats = cust.agg(
        F.sum("bal_c").alias("sum_c"), F.count("*").alias("n_all")
    )
    rich = cust.join(
        F.broadcast(stats),
        F.col("bal_c") * F.col("n_all") > F.col("sum_c"),
    ).select("c_custkey", "c_nationkey", "bal_c")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(Q22_SINCE).cast("timestamp")
    ).select("o_custkey")
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.round(F.sum("bal_c") / 100.0, 2).alias("total_acctbal"),
        )
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "n_cust", "total_acctbal",
        )
    )


def tpch_q22_oracle() -> str:
    return f"""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
),
stats AS (SELECT SUM(bal_c) AS sum_c, COUNT(*) AS n_all FROM c)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       ROUND(SUM(bal_c) / 100.0, 2) AS total_acctbal
FROM c, stats
WHERE bal_c * n_all > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{Q22_SINCE} 00:00:00')
GROUP BY c_nationkey
"""


Q13_EXCLUDE = "5-LOW"


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (Q13): the outer-join aggregate
    shape — customers with ZERO qualifying orders must survive with
    c_count = 0 (the filter stands in for TPC-H's o_comment NOT LIKE).

    Scale shape: orders pre-aggregate to one count row per customer
    (map-side combinable partial count BEFORE the exchange), then one
    left join against customers — the big orders relation never shuffles
    whole rows, only (custkey, count)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != Q13_EXCLUDE)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    per_cust = cust.join(
        counts, cust.c_custkey == counts.o_custkey, "left"
    ).select(F.coalesce("n_orders", F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select(
            F.col("c_count").cast("long").alias("c_count"),
            F.col("custdist").cast("long").alias("custdist"),
        )
    )


def tpch_q13_oracle() -> str:
    return f"""
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '{Q13_EXCLUDE}'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


Q17_BRAND = "Brand#12"


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (Q17): the correlated per-group scalar
    subquery shape — each lineitem compares against the avg quantity OF
    ITS OWN PART.  The per-part aggregate is a broadcast join-back
    (bounded by the brand-filtered part count), and the 0.2*avg threshold
    is exact integer arithmetic: ``qty * 5 * n_li < sum_qty`` — no float
    division anywhere until the final projection."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("ep_c"),
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "qty", "ep_c"
    )
    stats = j.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("n_li")
    )
    small = j.join(F.broadcast(stats), "l_partkey").where(
        F.col("qty") * 5 * F.col("n_li") < F.col("sum_qty")
    )
    return small.agg(
        F.round(F.sum("ep_c") / 700.0, 2).alias("avg_yearly")
    )


def tpch_q17_oracle() -> str:
    return f"""
WITH j AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
stats AS (
  SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS n_li
  FROM j GROUP BY l_partkey
)
SELECT ROUND(SUM(ep_c) / 700.0, 2) AS avg_yearly
FROM j JOIN stats USING (l_partkey)
WHERE qty * 5 * n_li < sum_qty
"""


Q21_NATION = "NATION_3"
Q21_TOPK = 10


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (Q21): the stacked
    EXISTS + NOT-EXISTS shape — for 'F' orders, a supplier's line is
    "late" when shipped after the order date (this schema's lateness
    proxy, as in Q4); keep suppliers of Q21_NATION whose late line is on
    an order where ANOTHER supplier also has a line (left-semi) but NO
    other supplier was late (left-anti).  Deterministic top-k by
    (numwait DESC, s_name)."""
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == Q21_NATION)
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey", "l_suppkey")
    l1 = late.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    waited = l1.join(
        other,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        other_late,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOPK)
    )


def tpch_q21_oracle() -> str:
    return f"""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q21_NATION}'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey != l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey != l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {Q21_TOPK}
"""


def tpch_q1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1's sums at every ROLLUP level — (flag, status), (flag), () —
    one pass producing all subtotal grains (map-side combinable, same
    integer-cents determinism); the null grouping indicators render as
    'ALL' on both engines so the hash is stable."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")
    )
    ep, d = _cents("l_extendedprice"), _pct("l_discount")
    rows = li.select(
        "l_returnflag", "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        (ep * (100 - d)).alias("disc_c"),
    )
    return (
        rows.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("s_qty"),
            F.sum("disc_c").alias("s_disc"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            F.col("s_qty").cast("long").alias("sum_qty"),
            F.round(F.col("s_disc") / 10000.0, 2).alias("sum_disc_price"),
            F.col("n").cast("long").alias("count_order"),
        )
    )


def tpch_q1_rollup_oracle() -> str:
    return f"""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0, 2) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_FROM, Q7_TO = "1996-01-01", "1998-01-01"


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (Q7): revenue flowing between two nations in either
    direction, by (supplier nation, customer nation, ship year).  Both
    nation-tagged dims broadcast; the disjunctive nation-pair predicate
    evaluates after the equi-joins, so the fact tables still shuffle only
    on their keys."""
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B)
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q7_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_TO).cast("timestamp"))
    ).select(
        "l_orderkey", "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_c"),
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B))
            | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_c").alias("s_rev"))
        .select(
            "supp_nation", "cust_nation",
            F.col("l_year").cast("long").alias("l_year"),
            F.round(F.col("s_rev") / 10000.0, 2).alias("revenue"),
        )
    )


def tpch_q7_oracle() -> str:
    return f"""
SELECT sn AS supp_nation, cn AS cust_nation, yr AS l_year,
       ROUND(SUM(rev_c) / 10000.0, 2) AS revenue
FROM (
  SELECT ns.n_name AS sn, nc.n_name AS cn,
         CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '{Q7_FROM} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q7_TO} 00:00:00'
    AND ((ns.n_name = '{Q7_NATION_A}' AND nc.n_name = '{Q7_NATION_B}')
      OR (ns.n_name = '{Q7_NATION_B}' AND nc.n_name = '{Q7_NATION_A}'))
)
GROUP BY sn, cn, yr
"""


Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_NATION = "NATION_5"
Q8_FROM, Q8_TO = "1996-01-01", "1998-01-01"


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (Q8): the target nation's share of revenue
    for one part type sold to one region's customers, by order year —
    conditional-sum ratio over a 7-relation star, every dim broadcast."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    rnation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(rnation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    snation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(snation), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    part = _t(spark, sf_dir, "part").where(
        F.col("p_type") == Q8_TYPE
    ).select("p_partkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q8_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_c"),
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == Q8_NATION, F.col("rev_c"))
                .otherwise(0)
            ).alias("nat_c"),
            F.sum("rev_c").alias("tot_c"),
        )
        .select(
            F.col("o_year").cast("long").alias("o_year"),
            F.round(F.col("nat_c") / F.col("tot_c"), 4).alias("mkt_share"),
            F.round(F.col("tot_c") / 10000.0, 2).alias("total_revenue"),
        )
    )


def tpch_q8_oracle() -> str:
    return f"""
SELECT CAST(yr AS BIGINT) AS o_year,
       ROUND(SUM(CASE WHEN sn = '{Q8_NATION}' THEN rev_c ELSE 0 END)::DOUBLE
             / SUM(rev_c), 4) AS mkt_share,
       ROUND(SUM(rev_c) / 10000.0, 2) AS total_revenue
FROM (
  SELECT year(o_orderdate) AS yr, ns.n_name AS sn,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nr ON c_nationkey = nr.n_nationkey
  JOIN region ON nr.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{Q8_FROM} 00:00:00'
    AND o_orderdate < TIMESTAMP '{Q8_TO} 00:00:00'
)
GROUP BY yr
"""


Q9_COLOR = "red"


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (Q9, adapted: this schema has no partsupp /
    supplycost, so "profit" is the discounted revenue — the shape is the
    LIKE-filtered part dim + supplier-nation rollup by order year)."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_COLOR)
    ).select("p_partkey")
    snation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), "n_name"
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(snation), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_c"),
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", "o_year")
        .agg(F.sum("rev_c").alias("s_rev"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_year").cast("long").alias("o_year"),
            F.round(F.col("s_rev") / 10000.0, 2).alias("sum_profit"),
        )
    )


def tpch_q9_oracle() -> str:
    return f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0, 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_COLOR}%'
GROUP BY n_name, year(o_orderdate)
"""


Q10_FROM, Q10_TO = "1996-01-01", "1996-04-01"
Q10_TOPK = 20


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (Q10): lost revenue from 'R' lineitems per
    customer in one quarter — fact-side filters push to the scans, the
    customer/nation dims broadcast, deterministic top-20 by
    (revenue DESC, c_custkey)."""
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select(
        "l_orderkey",
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_c"),
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum("rev_c").alias("s_rev"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            # half-up in EXACT integer space: s_rev has scale 1e-4; a
            # double ROUND(x/10000.0, 2) can land a hair below .xx5 and
            # flip the last cent differently per engine.  `div` keeps the
            # quotient in LONG arithmetic — `/` would promote to double
            # and beyond 2^53 the floor can again flip a cent vs DuckDB's
            # integer `//`
            (F.expr("(s_rev + 50) div 100") / 100.0).alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_TOPK)
    )


def tpch_q10_oracle() -> str:
    return f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) + 50) // 100)
         / 100.0 AS revenue,
       ROUND(c_acctbal, 2) AS c_acctbal, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q10_TO} 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q10_TOPK}
"""


Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (Q15): suppliers whose quarterly revenue equals the
    global maximum — the scalar-max-join shape, exact in integer cents
    (ties surface identically on both engines; no float max)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    ).select(
        "l_suppkey",
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_c"),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("rev_c").alias("total_c"))
    top = rev.agg(F.max("total_c").alias("max_c"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), F.col("total_c") == F.col("max_c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.round(F.col("total_c") / 10000.0, 2).alias("total_revenue"),
        )
    )


def tpch_q15_oracle() -> str:
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q15_TO} 00:00:00'
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       ROUND(total_c / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_c = (SELECT MAX(total_c) FROM rev)
"""


Q19_BRANDS = ("Brand#11", "Brand#22", "Brand#33")


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (Q19): the three-disjunct join predicate —
    each arm pairs a brand with its own quantity and size windows; the
    part dim broadcasts and the OR-of-ANDs evaluates as the join's
    residual filter."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_c"),
    )
    b1, b2, b3 = Q19_BRANDS
    cond = (
        ((F.col("p_brand") == b1) & F.col("qty").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == b2) & F.col("qty").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == b3) & F.col("qty").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.round(F.sum("rev_c") / 10000.0, 2).alias("revenue"))
    )


def tpch_q19_oracle() -> str:
    b1, b2, b3 = Q19_BRANDS
    return f"""
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0, 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = '{b1}' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = '{b2}' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = '{b3}' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


Q20_COLOR = "blue"
Q20_FROM, Q20_TO = "1996-01-01", "1997-01-01"
Q20_MIN_QTY = 50


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-promotion suppliers (Q20, adapted: no partsupp/availqty in
    this schema, so the inner threshold is shipped quantity) — the
    nested-semi shape: suppliers left-semi-joined against the set who
    shipped > Q20_MIN_QTY units of the color's parts in the year."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q20_COLOR)
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q20_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_TO).cast("timestamp"))
    ).select("l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("qty"))
    qualifying = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("qty").alias("total_qty"))
        .where(F.col("total_qty") > Q20_MIN_QTY)
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(
            qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi"
        )
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("s_nationkey").cast("long").alias("s_nationkey"),
        )
    )


def tpch_q20_oracle() -> str:
    return f"""
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(s_nationkey AS BIGINT) AS s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%{Q20_COLOR}%'
    AND l_shipdate >= TIMESTAMP '{Q20_FROM} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q20_TO} 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q20_MIN_QTY}
)
"""


# ---------------------------------------------------------------------------
# Derived relations: the columns TPC-H needs that the host schema lacks,
# synthesized as pure functions of host keys (the same derived-fixture
# pattern as curation.url_canonicalize).  The DuckDB oracles restate the
# identical formulas, so the relational SHAPES — min-cost correlated join
# (Q2), group-share threshold (Q11), derived-date conditional counts
# (Q12), distinct-count with blacklist anti-join (Q16) — are fully real
# while the data stays deterministic.  This completes the suite: 22/22.
# ---------------------------------------------------------------------------

PARTSUPP_SQL = """
SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey,
       (p_partkey * 31 + s_suppkey * 17) % 10000 + 1 AS ps_supplycost_c,
       (p_partkey * 7 + s_suppkey * 13) % 1000 + 1 AS ps_availqty
FROM part, supplier WHERE (p_partkey + s_suppkey) % 5 < 2
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp: supplier s stocks part p iff (p+s) % 5 < 2
    (~40% density); supplycost in exact integer cents and availqty are
    hash-like functions of the key pair.  Built as part x broadcast
    supplier (the supplier side is a genuine dimension: 100 rows at
    sf0.01, 10k at TPC-H sf1 — still broadcastable)."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey")
    return part.join(
        F.broadcast(supp),
        (F.col("p_partkey") + F.col("s_suppkey")) % 5 < 2,
    ).select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        ((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 10000 + 1)
        .alias("ps_supplycost_c"),
        ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 13) % 1000 + 1)
        .alias("ps_availqty"),
    )


Q2_REGION = "ASIA"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20
Q2_TYPE = "STANDARD"
Q2_TOPK = 20


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (Q2): for each qualifying part, the
    region's suppliers offering the MINIMUM supplycost — the correlated
    scalar-min subquery as a per-part aggregate joined back on equality
    (exact integer cents, so min-ties surface identically on both
    engines).  Deterministic top-k by (s_acctbal DESC, n_name, s_name,
    p_partkey)."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    part = _t(spark, sf_dir, "part").where(
        F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
        & (F.col("p_type") == Q2_TYPE)
    ).select("p_partkey", "p_type")
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey")
    ).join(
        F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    mins = ps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_c").alias("min_cost_c")
    ).select(
        F.col("ps_partkey").alias("m_partkey"), "min_cost_c"
    )
    return (
        ps.join(
            F.broadcast(mins),
            (F.col("ps_partkey") == F.col("m_partkey"))
            & (F.col("ps_supplycost_c") == F.col("min_cost_c")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name",
            F.col("ps_partkey").cast("long").alias("p_partkey"),
            "p_type",
            F.round(F.col("ps_supplycost_c") / 100.0, 2).alias("ps_supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(Q2_TOPK)
    )


def tpch_q2_oracle() -> str:
    return f"""
WITH ps AS ({PARTSUPP_SQL.strip()}),
q AS (
  SELECT s_acctbal, s_name, n_name, ps_partkey, p_type, ps_supplycost_c
  FROM ps
  JOIN part ON ps_partkey = p_partkey
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
    AND p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
    AND p_type = '{Q2_TYPE}'
)
SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       CAST(ps_partkey AS BIGINT) AS p_partkey, p_type,
       ROUND(ps_supplycost_c / 100.0, 2) AS ps_supplycost
FROM q q1
WHERE ps_supplycost_c = (SELECT MIN(ps_supplycost_c) FROM q q2
                         WHERE q2.ps_partkey = q1.ps_partkey)
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT {Q2_TOPK}
"""


Q11_NATION = "NATION_7"
Q11_SHARE_DIV = 1000  # keep parts holding > 1/1000 of the nation's value


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock (Q11): per-part inventory value for one nation's
    suppliers, keeping parts above a fixed fraction of the nation total —
    the group-vs-global-threshold shape with the total as a lazy 1-row
    broadcast, compared in exact integers (part_c * SHARE_DIV > total_c —
    no float division anywhere, so no cross-engine boundary flips)."""
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == Q11_NATION)
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey")
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost_c") * F.col("ps_availqty")).alias("value_c"),
    )
    per_part = ps.groupBy("ps_partkey").agg(F.sum("value_c").alias("part_c"))
    total = per_part.agg(F.sum("part_c").alias("total_c"))
    return (
        per_part.join(
            F.broadcast(total),
            F.col("part_c") * Q11_SHARE_DIV > F.col("total_c"),
        )
        .select(
            F.col("ps_partkey").cast("long").alias("ps_partkey"),
            F.round(F.col("part_c") / 100.0, 2).alias("value"),
        )
    )


def tpch_q11_oracle() -> str:
    return f"""
WITH ps AS ({PARTSUPP_SQL.strip()}),
v AS (
  SELECT ps_partkey, SUM(ps_supplycost_c * ps_availqty) AS part_c
  FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY ps_partkey
)
SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey,
       ROUND(part_c / 100.0, 2) AS value
FROM v
WHERE part_c * {Q11_SHARE_DIV} > (SELECT SUM(part_c) FROM v)
"""


Q12_MODES = ("MAIL", "SHIP")
Q12_FROM, Q12_TO = "1996-01-01", "1997-01-01"
LINEITEM_DERIVED_SQL = """
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
       CASE (l_orderkey + l_linenumber) % 3
            WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' ELSE 'AIR' END
         AS l_shipmode,
       l_shipdate + to_days(CAST((l_orderkey * 3 + l_linenumber) % 60 - 30
                                 AS INTEGER)) AS l_commitdate,
       l_shipdate + to_days(CAST((l_orderkey * 5 + l_linenumber) % 30 + 1
                                 AS INTEGER)) AS l_receiptdate
FROM lineitem
"""


def _lineitem_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem + derived shipmode/commitdate/receiptdate: pure functions
    of (l_orderkey, l_linenumber, l_shipdate) — commit within ±30 days of
    ship, receipt 1-30 days after ship, mode rotating over three
    carriers.  LINEITEM_DERIVED_SQL restates the identical formulas."""
    li = _t(spark, sf_dir, "lineitem")
    mode = (F.col("l_orderkey") + F.col("l_linenumber")) % 3
    commit_days = (F.col("l_orderkey") * 3 + F.col("l_linenumber")) % 60 - 30
    receipt_days = (F.col("l_orderkey") * 5 + F.col("l_linenumber")) % 30 + 1
    return li.select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity",
        F.when(mode == 0, "MAIL").when(mode == 1, "SHIP").otherwise("AIR")
        .alias("l_shipmode"),
        F.expr(
            "l_shipdate + make_dt_interval("
            "CAST((l_orderkey * 3 + l_linenumber) % 60 - 30 AS INT), 0, 0, 0)"
        ).alias("l_commitdate"),
        F.expr(
            "l_shipdate + make_dt_interval("
            "CAST((l_orderkey * 5 + l_linenumber) % 30 + 1 AS INT), 0, 0, 0)"
        ).alias("l_receiptdate"),
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipmode priority (Q12): per shipmode, how many late-committed
    lines carried urgent vs other orders — conditional counts over the
    derived dates, one shuffle on the order key."""
    li = _lineitem_derived(spark, sf_dir).where(
        F.col("l_shipmode").isin(*Q12_MODES)
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit(Q12_FROM).cast("timestamp"))
        & (F.col("l_receiptdate") < F.lit(Q12_TO).cast("timestamp"))
    ).select("l_orderkey", "l_shipmode")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
    )


def tpch_q12_oracle() -> str:
    return f"""
WITH li AS ({LINEITEM_DERIVED_SQL.strip()})
SELECT l_shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM li JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipmode IN ('{Q12_MODES[0]}', '{Q12_MODES[1]}')
  AND l_commitdate < l_receiptdate
  AND l_shipdate < l_commitdate
  AND l_receiptdate >= TIMESTAMP '{Q12_FROM} 00:00:00'
  AND l_receiptdate < TIMESTAMP '{Q12_TO} 00:00:00'
GROUP BY l_shipmode
"""


Q16_EXCL_BRAND = "Brand#11"
Q16_BLACKLIST_MOD = 10
Q16_BLACKLIST_REM = 3


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part/supplier relationship (Q16): distinct supplier counts per
    (brand, type, size) excluding one brand and a supplier blacklist
    (the "complaints" NOT-IN as a left-anti join) — the
    distinct-count-agg shape with two anti filters."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand") != Q16_EXCL_BRAND
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").where(
        F.col("s_suppkey") % Q16_BLACKLIST_MOD == Q16_BLACKLIST_REM
    ).select("s_suppkey")
    ps = _partsupp(spark, sf_dir).join(
        bad, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .select(
            "p_brand", "p_type",
            F.col("p_size").cast("long").alias("p_size"),
            "supplier_cnt",
        )
    )


def tpch_q16_oracle() -> str:
    return f"""
WITH ps AS ({PARTSUPP_SQL.strip()})
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON ps_partkey = p_partkey
WHERE p_brand != '{Q16_EXCL_BRAND}'
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier
    WHERE s_suppkey % {Q16_BLACKLIST_MOD} = {Q16_BLACKLIST_REM})
GROUP BY p_brand, p_type, p_size
"""
