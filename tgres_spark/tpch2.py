"""Relational spine, part 2 (SURVEY §2.9): eight more TPC-H-shaped
queries over the reduced testdata star schema — q7/q8 (multi-dim
broadcast joins + year pivots), q13 (left-join distribution), q15
(scalar-max view join), q17 (correlated per-part average), q18
(having-filtered fact self-agg), q19 (OR-of-ANDs pushdown showcase),
q22 (scalar-subquery anti-join).

Same posture as tpch.py: dimension tables broadcast, the only shuffles
are fact⋈fact on the uniform order key or a partkey/suppkey
re-aggregation; money sums are exact DECIMAL(38,6) (order-free) cast
to double only at the end, so every query hash-matches the DuckDB
oracle. The testdata lacks partsupp / p_container / c_phone /
commit-receipt dates, so the classic predicates those columns carry
are re-expressed on columns that exist (noted per query); the JOIN
SHAPE — what the query exercises — is unchanged.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import epoch_s, load_table
from .registry import register


def _epoch(date: str) -> int:
    return int(
        _dt.datetime.fromisoformat(date).replace(tzinfo=_dt.timezone.utc).timestamp()
    )

def _dec(c) -> F.Column:
    return c.cast("decimal(38,6)")


_E1997 = _epoch("1997-01-01")


def _year9697(t: F.Column) -> F.Column:
    """Ship/order year for rows already filtered to [1996, 1998):
    a single epoch-literal comparison — no timestamp functions, so
    Spark and DuckDB cannot disagree on calendars or time zones."""
    return F.when(t >= F.lit(_E1997), F.lit(1997)).otherwise(F.lit(1996))


_YEAR9697_SQL = "CASE WHEN {t} >= %d THEN 1997 ELSE 1996 END" % _E1997


@register(
    "tpch_q7",
    sql="""
SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    {year} AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND epoch_ns(l_shipdate) // 1000000000 >= {lo}
    AND epoch_ns(l_shipdate) // 1000000000 < {hi}
) shipping
GROUP BY supp_nation, cust_nation, l_year
""".format(
        year=_YEAR9697_SQL.format(t="epoch_ns(l_shipdate) // 1000000000"),
        lo=_epoch("1996-01-01"),
        hi=_epoch("1998-01-01"),
    ),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between a nation pair, by ship year.
    100 TB: supplier/customer/nation all broadcast — the supplier-side
    nation filter prunes lineitem BEFORE the one fact⋈fact shuffle
    (orders join on the uniform order key); the year pivot is a
    literal comparison on the epoch column, never a timestamp
    function."""
    lo, hi = _epoch("1996-01-01"), _epoch("1998-01-01")
    li = load_table(spark, sf_dir, "lineitem")
    l = li.where((epoch_s("l_shipdate", li) >= lo) & (epoch_s("l_shipdate", li) < hi))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    j = (
        l.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy(
            "supp_nation", "cust_nation",
            _year9697(epoch_s("l_shipdate", j)).alias("l_year"),
        )
        .agg(F.sum(_dec(vol)).cast("double").alias("revenue"))
    )


@register(
    "tpch_q8",
    sql="""
SELECT o_year,
  CAST(SUM(CASE WHEN s_nationkey = 3
       THEN CAST(volume AS DECIMAL(38,6))
       ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
  / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT {year} AS o_year,
    l_extendedprice * (1 - l_discount) AS volume, s_nationkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE p_type = 'PROMO' AND n_regionkey = 1
    AND epoch_ns(o_orderdate) // 1000000000 >= {lo}
    AND epoch_ns(o_orderdate) // 1000000000 < {hi}
) all_nations
GROUP BY o_year
""".format(
        year=_YEAR9697_SQL.format(t="epoch_ns(o_orderdate) // 1000000000"),
        lo=_epoch("1996-01-01"),
        hi=_epoch("1998-01-01"),
    ),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_3 suppliers' share of PROMO
    revenue sold into region 1, per order year. (The testdata nation
    table carries n_regionkey, so the region filter rides the
    broadcast customer-nation join exactly as in the classic query.)
    100 TB: FOUR broadcast dims around one fact⋈fact shuffle; both
    branch sums exact decimal so the share divides identically
    cross-engine."""
    lo, hi = _epoch("1996-01-01"), _epoch("1998-01-01")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO").select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == 1).select("n_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.where(
        (epoch_s("o_orderdate", orders) >= lo) & (epoch_s("o_orderdate", orders) < hi)
    ).select("o_orderkey", "o_custkey", epoch_s("o_orderdate", orders).alias("o_t"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
    )
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    num = F.when(F.col("s_nationkey") == 3, vol).otherwise(_dec(F.lit(0)))
    return (
        j.groupBy(_year9697(F.col("o_t")).alias("o_year"))
        .agg((F.sum(num).cast("double") / F.sum(vol).cast("double")).alias("mkt_share"))
    )


@register(
    "tpch_q13",
    sql="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution. (The classic o_comment
    NOT LIKE filter becomes a priority exclusion — the point is the
    filter lives in the JOIN condition of a LEFT join, so customers
    whose every order is excluded still appear with c_count = 0.)
    100 TB: one shuffle on the uniform customer key for the left
    join + count, then a tiny re-aggregation on c_count; the customer
    side is the smaller relation but both scale — no broadcast, and
    none needed."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    j = cust.join(
        orders,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    per_cust = j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15",
    sql="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
      AS total_revenue
  FROM lineitem
  WHERE epoch_ns(l_shipdate) // 1000000000 >= {lo}
    AND epoch_ns(l_shipdate) // 1000000000 < {hi}
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""".format(lo=_epoch("1996-01-01"), hi=_epoch("1996-04-01")),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: the supplier(s) whose quarter revenue equals
    the max over the per-supplier revenue view. Equality on double is
    safe here because both sides of both engines derive the value
    from the SAME exact decimal sum. 100 TB: the revenue view is one
    shuffle on the uniform suppkey; its scalar max re-enters as a
    one-row broadcast hash join (never a global sort, never a
    window-over-everything)."""
    lo, hi = _epoch("1996-01-01"), _epoch("1996-04-01")
    li = load_table(spark, sf_dir, "lineitem")
    l = li.where((epoch_s("l_shipdate", li) >= lo) & (epoch_s("l_shipdate", li) < hi))
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double").alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17",
    sql="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
  AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem WHERE l_partkey = p_partkey
  )
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: lineitems of Brand#5 parts
    below 20% of their part's average quantity. (Classic adds a
    container predicate; the schema has none — brand alone keeps the
    correlated-average shape.) 100 TB: filter part FIRST and
    broadcast it, so the per-part average aggregates only the
    surviving ~1/25 of lineitem; the avg then joins back on the
    pruned partkey — two shuffles over the filtered slice, never a
    whole-table correlated scan. The average divides an exact decimal
    sum by a count in double, identically in both engines."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#5").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    mine = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    avg = mine.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count("*")).alias("avg_qty")
    )
    j = mine.join(avg, F.col("l_partkey") == F.col("a_partkey")).where(
        F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")
    )
    return j.agg(
        (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0).alias("avg_yearly")
    )


@register(
    "tpch_q18",
    sql="""
SELECT c_name, c_custkey, o_orderkey,
  epoch_ns(o_orderdate) // 1000000000 AS o_orderdate_s, o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 180
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate_s, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds
    180, with their customer, top-100 by order price. 100 TB: the
    HAVING subquery is one shuffle on the uniform order key producing
    a SMALL keeper set that left-semi-joins the same shuffle
    partitioning (Spark reuses the exchange); customer broadcasts;
    the top-100 is distributed TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("sq"))
        .where(F.col("sq") > 180)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        epoch_s("o_orderdate", orders).alias("o_orderdate_s"),
    ).join(big, F.col("o_orderkey") == F.col("big_okey"), "left_semi")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate_s", "o_totalprice")
        .agg(F.sum(_dec(F.col("l_quantity"))).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q19",
    sql="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
  AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under an OR-of-ANDs predicate spanning
    both join sides (brand/size from part, quantity from lineitem —
    container/shipmode being absent, size bands stand in). 100 TB:
    the single-side disjuncts factor out — part prunes to 3 brands
    BEFORE broadcast, lineitem scans with the quantity range union
    pushed to parquet — and the residual cross-side OR evaluates
    inside the broadcast hash join, never a fact shuffle."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).where(
        (
            (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(F.sum(_dec(rev)).cast("double").alias("revenue"))


@register(
    "tpch_q22",
    sql="""
SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0
      AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND epoch_ns(o_orderdate) // 1000000000 >= {cut}
  )
GROUP BY c_nationkey
""".format(cut=_epoch("1999-01-01")),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: dormant high-balance customers
    per country. (No c_phone column → nationkey IS the country code;
    'has not ordered' becomes 'no order since 1999' so the anti-join
    is non-vacuous on testdata where every customer has SOME order.)
    100 TB: the scalar average enters as a one-row broadcast
    nested-loop join (cheap by construction), the NOT EXISTS is a
    left-anti shuffle join on the uniform customer key against the
    date-pruned orders scan."""
    cut = _epoch("1999-01-01")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    avg = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count("*")).alias("avg_bal")
    )
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.where(epoch_s("o_orderdate", orders) >= cut).select("o_custkey")
    j = (
        cust.join(F.broadcast(avg), F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        j.groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )
