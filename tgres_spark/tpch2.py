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


_YEAR_BOUNDS = tuple(_epoch(f"{y}-01-01") for y in range(1996, 2002))


def _year_full(t: F.Column) -> F.Column:
    """Order/ship year over the full 1995-2001 testdata span: 1995 +
    one epoch-literal comparison per later year — additive, no
    calendar functions, identical in both engines."""
    c = F.lit(1995)
    for e in _YEAR_BOUNDS:
        c = c + (t >= F.lit(e)).cast("int")
    return c


def _year_full_sql(t: str) -> str:
    parts = " + ".join(
        f"CAST(({t} >= {e}) AS INTEGER)" for e in _YEAR_BOUNDS
    )
    return f"1995 + {parts}"


@register(
    "tpch_q2",
    sql="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
    MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM ps
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size = 15 AND n_regionkey = 2
  AND supply_cost = (
    SELECT MIN(ps2.supply_cost) FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    WHERE ps2.l_partkey = p_partkey AND n2.n_regionkey = 2
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20
""",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier. (No partsupp table: the supply-cost
    relation is derived — MIN unit price over each (part, supplier)'s
    lineitems — which keeps the correlated-min-per-part shape
    intact.) 100 TB: ONE shuffle builds the ps relation on the
    uniform (part, supplier) key; part/supplier/nation broadcast; the
    per-part regional min re-enters as an equi-join on (partkey,
    cost) — the doubles agree because both engines derive them from
    the identical divide-then-min; top-20 is distributed."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == 2
    ).select("n_nationkey", "n_name")
    sn = sup.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    regional = (
        ps.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = regional.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.min("supply_cost").alias("best_cost")
    )
    return (
        regional.join(
            best,
            (F.col("p_partkey") == F.col("bk"))
            & (F.col("supply_cost") == F.col("best_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


@register(
    "tpch_q9",
    sql="""
SELECT n_name AS nation, o_year,
  CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name, {year} AS o_year,
    l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY n_name, o_year
""".format(year=_year_full_sql("epoch_ns(o_orderdate) // 1000000000")),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit by supplier nation and order year. (No
    partsupp: cost = p_retailprice * quantity stands in for
    ps_supplycost * quantity — same arithmetic shape, still a
    broadcast part attribute.) 100 TB: part/supplier/nation
    broadcast, the LIKE filter prunes part BEFORE broadcast, one
    fact⋈fact shuffle, year via six additive epoch comparisons, exact
    decimal profit sums."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_retailprice")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select("o_orderkey", epoch_s("o_orderdate", orders).alias("o_t"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            _year_full(F.col("o_t")).alias("o_year"),
        )
        .agg(F.sum(_dec(amount)).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q16",
    sql="""
SELECT p_brand, p_type, p_size,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier diversity per part class. (No partsupp: the
    (part, supplier) relation is read off lineitem; the classic
    complaint-supplier exclusion has no comment column to bite on.)
    100 TB: part prunes on brand+size THEN broadcasts; COUNT(DISTINCT)
    is Spark's two-phase expand-aggregate on the uniform partkey —
    partial distinct map-side, no raw supplier list ever collects."""
    part = load_table(spark, sf_dir, "part").where(
        (~F.col("p_brand").isin("Brand#1", "Brand#2"))
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt")
    )


@register(
    "tpch_q21",
    sql="""
WITH base AS (
  SELECT l_orderkey, l_suppkey,
    epoch_ns(l_shipdate) // 1000000000
      > epoch_ns(o_orderdate) // 1000000000 + 7776000 AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), waiting AS (
  SELECT DISTINCT b1.l_orderkey, b1.l_suppkey
  FROM base b1
  WHERE b1.late
    AND EXISTS (SELECT 1 FROM base b2
                WHERE b2.l_orderkey = b1.l_orderkey
                  AND b2.l_suppkey <> b1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM base b3
                    WHERE b3.l_orderkey = b1.l_orderkey
                      AND b3.l_suppkey <> b1.l_suppkey AND b3.late)
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM waiting JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 20
""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: per finalized
    multi-supplier order, the supplier who was the ONLY late one.
    (No commit/receipt dates: late = shipped > 90 days after the
    order date.) The classic double EXISTS / NOT EXISTS correlation
    collapses into ONE per-order aggregate — a supplier s qualifies
    iff s is late AND the order has >= 2 suppliers AND exactly one
    late supplier — so Spark runs ONE aggregate + window on the
    uniform order key instead of three correlated self-joins; the
    oracle keeps the EXISTS form (over the DISTINCT (order, supplier)
    projection, matching the per-order counting) to pin the
    equivalence.

    The per-order totals ride a WINDOW over the (order, supplier)
    aggregate rather than a second groupBy joined back: one lineitem
    scan (the re-join duplicates the whole base subtree — pushed-
    filter differences defeat ReusedExchange), window partitioned by
    the order key with suppliers-per-order bounding each frame."""
    from pyspark.sql import Window

    lo = 90 * 86400
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    o = orders.select("o_orderkey", epoch_s("o_orderdate", orders).alias("o_t"))
    li = load_table(spark, sf_dir, "lineitem")
    l = li.select(
        "l_orderkey", "l_suppkey", epoch_s("l_shipdate", li).alias("l_t")
    )
    base = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_t") > F.col("o_t") + lo).alias("late"),
    )
    per_os = base.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("s_late")
    )
    w = Window.partitionBy("l_orderkey")
    totals = per_os.select(
        "l_orderkey", "l_suppkey", "s_late",
        F.count("*").over(w).alias("n_supp"),
        F.sum(F.col("s_late").cast("int")).over(w).alias("n_late"),
    )
    waiting = totals.where(
        F.col("s_late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "tpch_q11",
    sql="""
WITH pv AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS value
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 3
  GROUP BY l_partkey
)
SELECT l_partkey, value FROM pv
WHERE value > (SELECT SUM(value) * 0.001 FROM pv)
ORDER BY value DESC, l_partkey LIMIT 50
""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 value concentration: parts whose traded value through one
    region's suppliers exceeds a fraction of that region's total. (No
    partsupp: value = traded lineitem price instead of availqty x
    supplycost — the HAVING-vs-global-scalar shape is the point.)
    100 TB: supplier/nation broadcast prune the fact scan, ONE
    shuffle on the uniform partkey builds pv, the global total
    re-enters as a one-row broadcast NLJ, top-50 distributed. The
    0.001 threshold multiplies the DOUBLE total identically in both
    engines (sum exact decimal first)."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == 3
    ).select("n_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    pv = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("value"))
    )
    total = pv.agg((F.sum("value") * 0.001).alias("cut"))
    return (
        pv.join(F.broadcast(total), F.col("value") > F.col("cut"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
        .limit(50)
    )


@register(
    "tpch_q20",
    sql="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
  GROUP BY l_partkey, l_suppkey
), y97 AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty97
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
    AND epoch_ns(l_shipdate) // 1000000000 >= {lo}
    AND epoch_ns(l_shipdate) // 1000000000 < {hi}
  GROUP BY l_partkey
)
SELECT DISTINCT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN ps ON ps.l_suppkey = s_suppkey
JOIN y97 ON y97.l_partkey = ps.l_partkey
WHERE n_regionkey = 4 AND ps.total_qty > 0.5 * y97.qty97
ORDER BY s_name
""".format(lo=_epoch("1997-01-01"), hi=_epoch("1998-01-01")),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 suppliers with surplus stock of a part family, per region.
    (No partsupp.availqty: a supplier's all-time shipped quantity of
    the part stands in for stock on hand, compared against half the
    part's 1997 corpus-wide movement — the nested-IN + correlated
    scalar-per-part shape survives intact.) 100 TB: the part-name
    IN-list is a broadcast semi-join pruning BOTH fact aggregations
    at the scan; ps shuffles once on the uniform (part, supplier)
    key; the per-part 1997 scalar joins back on partkey; supplier /
    nation broadcast."""
    lo, hi = _epoch("1997-01-01"), _epoch("1998-01-01")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    bolt = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    ps = bolt.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("total_qty")
    )
    y97 = (
        bolt.where(
            (epoch_s("l_shipdate", bolt) >= lo) & (epoch_s("l_shipdate", bolt) < hi)
        )
        .groupBy(F.col("l_partkey").alias("pk97"))
        .agg(F.sum(_dec(F.col("l_quantity"))).cast("double").alias("qty97"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == 4
    ).select("n_nationkey")
    sn = sup.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")
    return (
        ps.join(y97, F.col("l_partkey") == F.col("pk97"))
        .where(F.col("total_qty") > 0.5 * F.col("qty97"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name")
    )


@register(
    "tpch_basket_pairs",
    sql="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), no AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items
), pc AS (
  SELECT l_partkey, COUNT(*) AS n_one FROM items GROUP BY l_partkey
), ab AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 3
)
SELECT part_a, part_b, n_ab,
  pa.n_one AS n_a, pb.n_one AS n_b,
  CAST(n_ab AS DOUBLE) / n_orders AS support,
  CAST(n_ab AS DOUBLE) / pa.n_one AS confidence,
  (CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE))
    / (CAST(pa.n_one AS DOUBLE) * CAST(pb.n_one AS DOUBLE)) AS lift
FROM ab
JOIN pc pa ON pa.l_partkey = part_a
JOIN pc pb ON pb.l_partkey = part_b
CROSS JOIN no
""",
)
def tpch_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over the order fact: co-purchased
    part pairs with support / confidence / lift — the association-rule
    relation (Agrawal's Apriori at k=2) a retail OLAP stack derives
    from exactly this schema. Pairs with n_ab >= 3 survive (the
    classic min-support prune that keeps the k=2 candidate set from
    exploding before lift ranks it).

    100 TB: the pair generator is a SELF-JOIN CO-KEYED ON l_orderkey —
    both sides arrive already partitioned by the same uniform key, and
    the per-order fan-out is bounded by basket size (max 13 distinct
    parts/order in this data; TPC-H caps at 7 lines), so the joined
    relation is O(orders x basket^2), never parts^2. The pair groupBy
    shuffles uniform hashed (part_a, part_b) keys; the per-part count
    relation is part-domain-sized and BROADCASTS back into the pair
    relation twice; n_orders re-enters as a one-row broadcast. All
    counts are exact integers; support/confidence/lift divide doubles
    cast from exact integers in the same operand order as the oracle,
    so every hash matches bit-for-bit."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    no = items.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    pc = items.groupBy("l_partkey").agg(F.count("*").alias("n_one"))
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    ab = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    pa = pc.select(F.col("l_partkey").alias("part_a"), F.col("n_one").alias("n_a"))
    pb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n_one").alias("n_b"))
    lift = (F.col("n_ab").cast("double") * F.col("n_orders").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return (
        ab.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .crossJoin(F.broadcast(no))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab").cast("double") / F.col("n_orders")).alias("support"),
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence"),
            lift.alias("lift"),
        )
    )


_SEASON_PERIOD_S = 30 * 86400  # fixed 30-day periods: calendar-free,
# so the period id is pure integer DIV of the epoch in BOTH engines
# (calendar months would route through timezone-sensitive date parts —
# the NTZ/LTZ drift class model.epoch_s exists to avoid)


@register(
    "tpch_orders_seasonality",
    sql=f"""
WITH o AS (
  SELECT epoch_ns(o_orderdate) // 1000000000 // {_SEASON_PERIOD_S} AS period,
         CAST(o_totalprice AS DECIMAL(38,6)) AS p
  FROM orders
), per AS (
  SELECT period, COUNT(*) AS n_orders, CAST(SUM(p) AS DOUBLE) AS revenue
  FROM o GROUP BY period
)
SELECT CAST(period AS BIGINT) AS period, CAST(n_orders AS BIGINT) AS n_orders,
  revenue,
  LAG(revenue) OVER (ORDER BY period) AS prev_revenue,
  CASE WHEN LAG(revenue) OVER (ORDER BY period) IS NOT NULL
       AND LAG(revenue) OVER (ORDER BY period) <> 0.0
       THEN ROUND((revenue - LAG(revenue) OVER (ORDER BY period))
                  / LAG(revenue) OVER (ORDER BY period), 6) END AS growth
FROM per
""",
)
def tpch_orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-volume seasonality (round 9): per fixed 30-day period,
    order count, exact-decimal revenue, and period-over-period growth
    — the demand-trend relation every order warehouse charts. Periods
    are integer DIV of the epoch (calendar-free: date-part extraction
    routes through timezone machinery that differs between engines —
    the drift class model.epoch_s exists to avoid — and a 30-day grid
    answers the same seasonality question).

    100 TB: ONE groupBy on the ~period-count key domain (map-side
    combined; the fact table never re-shuffles), then the lag window
    runs on the PERIOD relation — rows = corpus timespan / 30 days
    (decades of data = hundreds of rows), a declared tiny
    single-partition window of the corpus_zipf_fit class, never
    row-count-sized. Determinism: exact decimal revenue sums cast to
    double before the growth division, growth rounded at 6."""
    o = load_table(spark, sf_dir, "orders")
    e = epoch_s("o_orderdate", o)
    # exact integer floor division: (e - e % P) / P divides exactly, so
    # the double quotient is exact and the bigint cast can't straddle a
    # boundary (a raw e / P double can round UP within half an ulp of
    # an integer — the /-then-cast trap, see
    # [[spark-duckdb-int-cast-rounding]])
    per = (
        o.select(
            ((e - e % _SEASON_PERIOD_S) / _SEASON_PERIOD_S)
            .cast("bigint")
            .alias("period"),
            _dec(F.col("o_totalprice")).alias("p"),
        )
        .groupBy("period")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("p").cast("double").alias("revenue"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("period")
    prev = F.lag("revenue").over(w)
    return per.select(
        "period",
        "n_orders",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(
            prev.isNotNull() & (prev != 0.0),
            F.round((F.col("revenue") - prev) / prev, 6),
        ).alias("growth"),
    )
