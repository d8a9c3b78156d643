"""Round-4 TPC-H-shaped relational tier: the query shapes the reference's
users would run through pandas after ``get_full_df()`` (SURVEY §2.2 C2/C5)
re-expressed as single declarative Spark plans — here focused on the forms
Catalyst has to *decorrelate* or plan specially: EXISTS / NOT EXISTS
semi- and anti-joins, left-outer count distributions, scalar subqueries,
per-group scalar thresholds, and disjunctive pushdown.

Every query is adapted to the driver testdata's columns (TESTDATA.md): the
tables lack l_shipmode / partsupp / c_phone, so the *shape* of each TPC-H
query is preserved (the join/subquery structure Catalyst must plan) while
the predicates use columns that exist. All money sums route through
DECIMAL(28,6) in both engines (see queries/__init__ exactness rules).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query
from .common import dsum, dsum_sql, load


@query(
    "sql_q4_priority_check",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate))
GROUP BY o.o_orderpriority
""",
)
def sql_q4_priority_check(spark, sf_dir):
    """TPC-H-Q4-shaped EXISTS decorrelation: orders with at least one
    late-shipping lineitem, counted per priority. The correlated EXISTS
    becomes one LEFT SEMI hash join on the order key with the non-equi
    ship-after-order predicate evaluated as the join's residual filter —
    the semi join dedups order keys *inside* the join (no distinct pass),
    and the probe side carries only (orderkey, two epoch-us longs). At
    100 TB both sides hash-partition on the same key; nothing is
    broadcast because both are fact-sized."""
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("__o_us"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("__s_us")
    )
    hit = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (F.col("__s_us") > F.col("__o_us")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "sql_q12_priority_by_flag",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_quantity < 30
GROUP BY l.l_returnflag
""",
)
def sql_q12_priority_by_flag(spark, sf_dir):
    """TPC-H-Q12-shaped conditional aggregation after a fact-fact join
    (testdata has no l_shipmode; l_returnflag plays the mode). The two
    CASE counts collapse into ONE aggregation pass — never two filtered
    joins; the quantity filter is pushed to the lineitem scan so the join
    probe side shrinks before the shuffle."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") < 30)
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "sql_q13_order_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
    ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS n_custs
FROM per_cust GROUP BY c_count
""",
)
def sql_q13_order_distribution(spark, sf_dir):
    """TPC-H-Q13-shaped customer order-count distribution: LEFT OUTER
    join so zero-order customers survive with count 0 (count(col) skips
    the nulls the outer join manufactures — the semantic core of Q13),
    then a second tiny aggregation over the counts. The orders side is
    pre-filtered and pre-aggregated to (custkey, n) BEFORE the outer join
    so the join carries one row per customer per side instead of one row
    per order — at 100 TB that turns a fact-sized outer join into a
    dim-sized one."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    per_cust_orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_cust = cust.join(
        per_cust_orders, cust.c_custkey == per_cust_orders.o_custkey, "left_outer"
    ).select(F.coalesce(F.col("__n"), F.lit(0)).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_custs"))


@query(
    "sql_q16_supplier_parts",
    oracle="""
SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (1, 14, 23, 45, 49)
  AND p.p_brand <> 'Brand#45'
  AND NOT EXISTS (SELECT 1 FROM supplier s
                  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
""",
)
def sql_q16_supplier_parts(spark, sf_dir):
    """TPC-H-Q16-shaped supplier diversity count (lineitem stands in for
    partsupp; negative-balance suppliers play the complaints exclusion).
    The NOT EXISTS is a LEFT ANTI join against the *filtered* supplier
    dim — broadcast, since the exclusion list is tiny; the part dim
    filters on size/brand before broadcasting. COUNT(DISTINCT suppkey)
    is planned as a two-phase expand-aggregate (partial distinct below
    the shuffle), not a global dedup."""
    bad_supp = (
        load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    part = (
        load(spark, sf_dir, "part")
        .where(F.col("p_size").isin(1, 14, 23, 45, 49) & (F.col("p_brand") != "Brand#45"))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    kept = li.join(
        F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti"
    ).join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
    return kept.groupBy("p_brand", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


@query(
    "sql_q17_small_qty_revenue",
    oracle="""
WITH avg_q AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_items
FROM lineitem l JOIN avg_q a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < 0.2 * a.avg_qty
""",
)
def sql_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H-Q17-shaped correlated scalar subquery (revenue of lineitems
    below 20% of their part's average quantity). The oracle decorrelates
    to an agg+join; the engine goes one better — a single window AVG over
    ``partition by l_partkey`` computes the threshold in the SAME hash
    partitioning the filter then consumes: one shuffle total, no join.
    The average is decimal-sum / count (identical bits both engines), so
    the 0.2× threshold comparison keeps identical rows at the boundary."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    small = li.withColumn("__avg", avg_qty).where(F.col("l_quantity") < 0.2 * F.col("__avg"))
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double") / 7.0).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "sql_q19_disjunctive_revenue",
    oracle=f"""
SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       count(*) AS n
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def sql_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H-Q19-shaped disjunctive predicate join. Catalyst extracts the
    common conjuncts of the OR branches to each side of the join — the
    part side pre-filters to the union of the three brand/size envelopes
    (so the broadcast build shrinks), the lineitem side to the quantity
    envelope 1–30 (pushed to the scan) — and evaluates the full
    disjunction as the join residual. One broadcast join, one agg."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(branch)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "sql_q22_idle_customers",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment, count(*) AS n_custs,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
""",
)
def sql_q22_idle_customers(spark, sf_dir):
    """TPC-H-Q22-shaped: above-average-balance customers with no urgent
    orders, per market segment (segment plays Q22's country code). Two
    subquery forms in one plan: the scalar AVG becomes a 1-row broadcast
    cross join (never a collect), and the NOT EXISTS becomes a LEFT ANTI
    hash join against the filtered orders fact — at scale both sides
    hash-partition on custkey; the anti join's build side is only the
    urgent slice. Balance sums stay decimal-exact so the > threshold
    keeps identical rows in both engines."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    urgent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double") / F.count(F.lit(1))).alias(
            "ab"
        )
    )
    rich = cust.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("ab"))
    idle = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        dsum("c_acctbal", "total_bal"),
    )


@query(
    "sql_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(l.l_extendedprice / l.l_quantity) AS unit_cost
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE' AND l.l_quantity > 0
  GROUP BY l.l_partkey, l.l_suppkey
)
SELECT p.p_partkey, c.l_suppkey AS s_suppkey, c.unit_cost
FROM cost c JOIN part p ON p.p_partkey = c.l_partkey
WHERE p.p_size = 15
  AND c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                     WHERE c2.l_partkey = c.l_partkey)
""",
)
def sql_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H-Q2-shaped correlated min subquery: the cheapest European
    supplier per size-15 part (lineitem plays partsupp; unit price plays
    supply cost). The correlated ``= (SELECT min ...)`` decorrelates to a
    min window over the SAME (partkey) partitioning the filter consumes —
    no self-join of the cost table; the region restriction reaches the
    fact scan through two broadcast hops (region→nation→supplier) before
    any lineitem moves. Ties emit all minimal suppliers in both engines
    (the hash compare is order-insensitive)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0).select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)),
                  supp.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    cost = (
        li.join(F.broadcast(euro_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("__mn", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("__mn")
    )
    part = load(spark, sf_dir, "part").where(F.col("p_size") == 15).select("p_partkey")
    return best.join(
        F.broadcast(part), best.l_partkey == part.p_partkey
    ).select("p_partkey", F.col("l_suppkey").alias("s_suppkey"), "unit_cost")


@query(
    "sql_q7_nation_volume",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS revenue,
       count(*) AS n
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
)
def sql_q7_nation_volume(spark, sf_dir):
    """TPC-H-Q7-shaped bilateral trade volume: shipping between two
    nations per direction per year. Both nation dims (and supplier /
    customer, each pre-filtered to the two nations — ~8 % of the dim)
    broadcast; the only real shuffle is orders⋈lineitem. The year comes
    from civil UTC calendar on both engines (session TZ pinned)."""
    nat = load(spark, sf_dir, "nation").where(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_extendedprice",
        "l_discount",
        F.year(F.col("l_shipdate").cast("timestamp")).alias("l_year"),
    )
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy("supp_nation", "cust_nation", "l_year").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sql_q10_returned_revenue",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def sql_q10_returned_revenue(spark, sf_dir):
    """TPC-H-Q10-shaped returned-item ranking: lost revenue per customer
    over returned lineitems, global top-20. The returnflag filter is
    pushed to the lineitem scan (≈⅓ survives); customer broadcasts; the
    top-20 plans as TakeOrderedAndProject over the aggregated frame —
    each partition contributes its local top-20, never a global sort."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "sql_q11_important_stock",
    oracle="""
WITH vals AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS part_val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(part_val AS DOUBLE) AS part_value
FROM vals
WHERE CAST(part_val AS DOUBLE) >
      0.001 * (SELECT CAST(SUM(part_val) AS DOUBLE) FROM vals)
""",
)
def sql_q11_important_stock(spark, sf_dir):
    """TPC-H-Q11-shaped group-sum-fraction filter: parts whose stock
    value within one nation exceeds a fraction of the nation's total.
    The scalar total is a 1-row broadcast cross join over the
    ALREADY-AGGREGATED per-part frame (the per-part aggregate is
    computed once and reused for both sides — no second scan); both
    sides of the > compare collapse the same decimal sums to doubles, so
    the boundary rows agree across engines."""
    nat = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    vals = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).alias("__pv"))
    )
    vals = vals.localCheckpoint(eager=False)
    total = vals.agg(F.sum("__pv").cast("double").alias("__tot"))
    return (
        vals.join(F.broadcast(total))
        .where(F.col("__pv").cast("double") > 0.001 * F.col("__tot"))
        .select("l_partkey", F.col("__pv").cast("double").alias("part_value"))
    )


@query(
    "sql_q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem WHERE l_returnflag = 'N'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)
def sql_q15_top_supplier(spark, sf_dir):
    """TPC-H-Q15-shaped view + scalar-max subquery: the supplier(s) whose
    non-returned revenue equals the global maximum. The revenue view is
    computed once (checkpointed, reused by both the max and the filter);
    the scalar max is a 1-row broadcast. Revenue is the decimal sum cast
    to double on both engines, so equality-at-the-max matches exactly —
    the comparison Q15 is famous for being float-fragile."""
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "N")
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "sql_q21_waiting_suppliers",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         epoch_us(l_shipdate) AS s_us
  FROM lineitem
),
o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) AS o_us
  FROM orders WHERE o_orderstatus = 'F'
)
SELECT s.s_name, count(*) AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM li l1 JOIN o ON l1.l_orderkey = o.o_orderkey
  WHERE l1.s_us > o.o_us
    AND EXISTS (SELECT 1 FROM li l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM li l3 JOIN o o3 ON l3.l_orderkey = o3.o_orderkey
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.s_us > o3.o_us)
) w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY s.s_name
""",
)
def sql_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H-Q21-shape — the hardest decorrelation in the suite: per
    order, the supplier who shipped late counts only when ANOTHER
    supplier participated (EXISTS) and NO other supplier was also late
    (NOT EXISTS). Both correlated subqueries decorrelate to per-order
    AGGREGATES over one shared scan — n_supps = distinct suppliers,
    n_late_supps = distinct late suppliers — joined back on the order
    key: the multi-supplier test is n_supps > 1, the sole-offender test
    is n_late_supps = 1 ∧ this supplier late. One lineitem shuffle total
    where the literal EXISTS/NOT-EXISTS rewrite would pay three."""
    orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("__o_us"),
        )
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("__s_us"),
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", (F.col("__s_us") > F.col("__o_us")).alias("late")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supps"),
    )
    waiting = (
        lo.where(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(per_order, "l_orderkey")
        .where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "sql_q8_market_share",
    oracle="""
SELECT year(o.o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                     ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS mkt_volume,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS total_volume,
       count(*) AS n
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n1.n_regionkey
WHERE p.p_type = 'STANDARD' AND r.r_name = 'ASIA'
GROUP BY 1
""",
)
def sql_q8_market_share(spark, sf_dir):
    """TPC-H-Q8-shaped national market share: of all STANDARD-part
    revenue sold into the ASIA market, how much was supplied from
    NATION_5, per order year. The share division is deliberately left to
    the reader (numerator and denominator surface as separate
    decimal-exact columns) so the result stays bit-identical across
    engines. Plan shape: part (type-filtered, ~1/6), supplier+nation
    (carrying a supplied-from-NATION_5 flag, not the name), and the
    ASIA-restricted customer dim all BROADCAST; the single real exchange
    is lineitem⋈orders on the order key. The conditional/total split is
    one aggregation pass — Q14's pattern lifted into an 8-table tree."""
    part = (
        load(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD").select("p_partkey")
    )
    nat = load(spark, sf_dir, "nation")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", (F.col("n_name") == "NATION_5").alias("from_mkt_nation"))
    )
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nat = nat.join(
        F.broadcast(region), nat.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year"),
        )
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    zero = F.lit(0).cast("decimal(28,6)")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy("o_year").agg(
        F.sum(F.when(F.col("from_mkt_nation"), rev).otherwise(zero))
        .cast("double")
        .alias("mkt_volume"),
        F.sum(rev).cast("double").alias("total_volume"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sql_q9_product_profit",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
              - CAST(p.p_retailprice * 0.1 * l.l_quantity AS DECIMAL(28,6)))
            AS DOUBLE) AS sum_profit,
       count(*) AS n
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def sql_q9_product_profit(spark, sf_dir):
    """TPC-H-Q9-shaped product-type profit: per supplier nation per order
    year over widget parts. The testdata has no partsupp, so
    ps_supplycost is surrogated as 10 % of p_retailprice (the join
    STRUCTURE — a name-LIKE-filtered part dim fanning into a five-table
    tree — is what Q9 exercises; documented divergence). Revenue and
    cost each route through DECIMAL before the subtraction so the profit
    sum is exact. part (LIKE-filtered), supplier, nation broadcast; the
    one real exchange is lineitem⋈orders for the year column."""
    part = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    nat = load(spark, sf_dir, "nation")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    cost = (F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")).cast("decimal(28,6)")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy("nation", "o_year").agg(
        F.sum(rev - cost).cast("double").alias("sum_profit"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sql_q20_dominant_supplier",
    oracle="""
WITH pl AS (
  SELECT l.l_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%' AND year(l.l_shipdate) = 1997
  GROUP BY 1, 2
), dom AS (
  SELECT l_suppkey,
         CAST(qty AS DOUBLE) AS q,
         CAST(SUM(qty) OVER (PARTITION BY l_partkey) AS DOUBLE) AS tot
  FROM pl
)
SELECT s.s_suppkey, s.s_name, count(*) AS n_parts
FROM dom d
JOIN supplier s ON s.s_suppkey = d.l_suppkey
WHERE d.q > 0.5 * d.tot
GROUP BY 1, 2
""",
)
def sql_q20_dominant_supplier(spark, sf_dir):
    """TPC-H-Q20-shaped nested-subquery supplier selection: suppliers who
    shipped MORE THAN HALF of a small-part's total 1997 volume, with how
    many parts they dominate. Q20's correlated availqty-vs-half-demand
    threshold (the testdata has no partsupp) becomes a per-part share
    threshold over the same aggregate: group to (part, supplier, exact
    decimal qty), then the per-part total is a window SUM over that
    ALREADY-AGGREGATED frame — the nested IN + correlated scalar
    decorrelate to one aggregation, one window, zero self-joins. Both
    sides of the > compare as doubles of exact decimal sums, so the
    boundary is engine-stable. The name-filtered part dim broadcasts
    into the lineitem scan; the supplier dim broadcasts at the end onto
    a supplier-count-sized frame."""
    part = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.year(F.col("l_shipdate").cast("timestamp")) == 1997)
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    pl = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dom = pl.select(
        "l_suppkey",
        F.col("qty").cast("double").alias("q"),
        F.sum("qty").over(w).cast("double").alias("tot"),
    ).where(F.col("q") > 0.5 * F.col("tot"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dom.join(F.broadcast(supp), dom.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
