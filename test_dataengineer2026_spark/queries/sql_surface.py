"""The spark.sql() surface (repo:BASELINE.json:7 "SQL transformations")
plus V6 SQL UDF registration (SURVEY.md §2.11).

Same Catalyst plans as the DataFrame API — these queries prove the
engine exposes the full SQL entry point over registered views, including
correlated subqueries (decorrelated by Catalyst), CTEs, window SQL, and
Python UDFs callable from SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from test_dataengineer2026_spark import tables
from test_dataengineer2026_spark.registry import register
from test_dataengineer2026_spark.session import apply_runtime_confs

def _dsum_rev(p: str = "") -> str:
    """Exact-decimal revenue sum (determinism.py convention), with an
    optional table alias prefix for multi-table SQL."""
    return (
        f"CAST(CAST(SUM(CAST({p}l_extendedprice AS DECIMAL(18,4)) * "
        f"(CAST(1 AS DECIMAL(8,4)) - CAST({p}l_discount AS DECIMAL(8,4)))) "
        "AS DECIMAL(18,6)) AS DOUBLE)"
    )


_DSUM_REV = _dsum_rev()


@register(
    "SQL1_tpch_q3",
    oracle=f"""
SELECT l.l_orderkey,
       {_DSUM_REV} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
    tags=("sql",),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: TPC-H-Q3-shaped shipping-priority query via
    spark.sql over registered temp views."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(
        f"""
SELECT l.l_orderkey,
       {_DSUM_REV} AS revenue,
       date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""
    )


_AVG_BAL = (
    "CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS DOUBLE)"
    " / COUNT(*)"
)


@register(
    "SQL2_correlated_subquery",
    oracle=f"""
SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT {_AVG_BAL}
  FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
""",
    tags=("sql", "subquery"),
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: correlated scalar subquery — Catalyst decorrelates
    this into an aggregate + join (SURVEY §4.2), no per-row re-execution."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(
        f"""
SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT {_AVG_BAL}
  FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
"""
    )


_SQL3 = """
WITH nation_orders AS (
  SELECT c.c_nationkey AS nationkey, o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), ranked AS (
  SELECT nationkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY nationkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM nation_orders
)
SELECT * FROM ranked WHERE rk <= 2
"""


@register(
    "SQL3_cte_window",
    oracle=_SQL3,
    tags=("sql", "window"),
)
def cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: CTE + window + rank filter (top-2 orders per nation)."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(_SQL3)


@register(
    "V6_sql_udf_registration",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(generate_series(1,64),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 9) AS norm
FROM embeddings
WHERE vec_id < 100
""",
    tags=("sql", "udf"),
)
def sql_udf_registration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V6: a Pandas UDF registered into the SQL function namespace and
    invoked from SQL text."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    from test_dataengineer2026_spark.queries.udf_surface import l2_norm_udf

    spark.udf.register("l2norm", l2_norm_udf)
    return spark.sql(
        "SELECT vec_id, round(l2norm(embedding), 9) AS norm "
        "FROM embeddings WHERE vec_id < 100"
    )


_SQL4 = f"""
SELECT n.n_name,
       {_dsum_rev('l.')} AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@register(
    "SQL4_tpch_q5",
    oracle=_SQL4,
    tags=("sql", "join"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: TPC-H-Q5-shaped local-supplier revenue — a six-table
    join (two fact tables + four dims) with the classic co-nation
    constraint. The optimizer showcase: dims broadcast, region/date
    filters push into the scans, and join order is Catalyst's call, not
    hand-scheduled. Identical SQL text runs on both engines."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(_SQL4)


_SQL5 = f"""
SELECT c.c_custkey, c.c_name,
       {_dsum_rev('l.')} AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register(
    "SQL5_tpch_q10",
    oracle=_SQL5,
    tags=("sql", "topk"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: TPC-H-Q10-shaped returned-item report — top-20
    customers by lost revenue. TakeOrderedAndProject caps the sort at
    k=20 per partition, exact decimal revenue keeps the ranking
    engine-identical (unique c_custkey tiebreak)."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(_SQL5)


_SQL6 = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
       CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,6))
            AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register(
    "SQL6_tpch_q18",
    oracle=_SQL6,
    tags=("sql", "subquery", "topk"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: TPC-H-Q18-shaped large-volume-customer query — an
    aggregate HAVING subquery feeding an IN predicate, which Catalyst
    rewrites to a left-semi join against the pre-aggregated lineitem
    (no decorrelation-by-row, no repeated scans thanks to exchange
    reuse). Exact decimal quantity sums keep the HAVING cut and the
    reported sum engine-identical; LIMIT 100 runs as
    TakeOrderedAndProject with the unique o_orderkey tiebreak."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(_SQL6)


_DSUM_QTY = (
    "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,6)) "
    "AS DOUBLE)"
)

# Q14: identical text on both engines — promo share of revenue in one
# month, computed as a ratio of two exact-decimal conditional sums.
_SQL7 = """
SELECT 100.00 *
       CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) *
                  (CAST(1 AS DECIMAL(8,4)) - CAST(l.l_discount AS DECIMAL(8,4)))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,6)) AS DOUBLE) /
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) *
                  (CAST(1 AS DECIMAL(8,4)) - CAST(l.l_discount AS DECIMAL(8,4))))
            AS DECIMAL(18,6)) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


@register(
    "SQL7_tpch_q14",
    oracle=_SQL7,
    tags=("sql", "join"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: TPC-H-Q14-shaped promotion-effect query — the share
    of one month's revenue coming from PROMO parts. A single fact-dim
    join (part broadcasts, the shipdate range pushes into the lineitem
    scan) feeding one global aggregate; both conditional revenue sums
    are exact decimals narrowed once, so the final ratio is bit-equal
    cross-engine."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(_SQL7)


# Q17: small-quantity-order revenue — correlated scalar subquery that
# Catalyst decorrelates into an aggregate+join on l_partkey. The
# correlated avg uses the exact-sum/count form so the 0.2x threshold is
# the same double on both engines.
_SQL8 = f"""
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
            AS DECIMAL(18,6)) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND p.p_size <= 10
  AND l.l_quantity < (
    SELECT 0.2 * ({_DSUM_QTY} / COUNT(l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@register(
    "SQL8_tpch_q17",
    oracle=_SQL8,
    tags=("sql", "subquery"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: TPC-H-Q17-shaped small-quantity-order query. The
    per-part average quantity is a correlated scalar subquery over the
    SAME fact table — the plan contract is that Catalyst decorrelates it
    into one groupBy(l_partkey) aggregate joined back (exchange reuse,
    no per-row re-scan). Brand/size filters prune the part dim before it
    broadcasts."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(_SQL8)


# Q19: disjunction of conjunctive brand/size/quantity predicates — the
# optimizer must push the common join key through the OR and evaluate
# the residual disjunction post-join.
_SQL9 = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) *
             (CAST(1 AS DECIMAL(8,4)) - CAST(l.l_discount AS DECIMAL(8,4))))
       AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


@register(
    "SQL9_tpch_q19",
    oracle=_SQL9,
    tags=("sql", "join"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: TPC-H-Q19-shaped discounted-revenue query — three
    OR'd conjunctions over the joined fact+dim. The join key is common
    to every branch, so the join itself stays a plain broadcast equi-join
    with the disjunction as a residual filter; per-branch part predicates
    still prune the broadcast side."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(_SQL9)


# Q22: customers with above-average balances and no orders — a global
# scalar subquery threshold plus a NOT EXISTS anti-join, grouped by
# nation as the stand-in for TPC-H's phone country code.
_SQL10 = """
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,6))
            AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
              AS DECIMAL(18,6)) AS DOUBLE) / COUNT(*)
  FROM customer c2 WHERE c2.c_acctbal > 0.0
)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
  )
GROUP BY c.c_nationkey
"""


@register(
    "SQL10_tpch_q22",
    oracle=_SQL10,
    tags=("sql", "subquery", "join"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: TPC-H-Q22-shaped global-sales-opportunity query —
    positive-balance customers above the global average balance with no
    premium (>400k) orders, counted per nation. Exercises an uncorrelated scalar
    subquery (computed once, broadcast as a literal-like filter) and a
    NOT EXISTS that plans as a left-anti join on c_custkey (the totalprice
    filter pushes into the orders scan before the anti-join)."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    return spark.sql(_SQL10)
