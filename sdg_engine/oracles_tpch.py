"""DuckDB oracle twins for the TPC-H-adapted suite (queries_tpch.py).

The SQL-surface queries (q4/q7/q8/q9/q15/q20/q21/q22) reuse the
ENGINE'S OWN template formatted with the bare table names DuckDB
pre-registers — the two engines literally parse the same text, so the
only thing under test is execution.  The DataFrame-API queries get
hand-written twins built from the same exact-integer fragments
(queries_tpch.CENTS / CC / SUM_CC), keeping every money fold
BIGINT-exact in both engines (CLAUDE.md gotchas 7/8; DuckDB
SUM(BIGINT)→HUGEINT is re-CAST in the shared text)."""

from __future__ import annotations

from .queries_tpch import (
    CC,
    CENTS,
    PCT,
    Q2_TEMPLATE,
    Q4_TEMPLATE,
    Q11_TEMPLATE,
    Q7_TEMPLATE,
    Q8_TEMPLATE,
    Q9_TEMPLATE,
    Q15_TEMPLATE,
    Q20_TEMPLATE,
    Q21_TEMPLATE,
    Q22_TEMPLATE,
    SUM_CC,
)

_BARE = {
    t: t
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
}

ORACLES_TPCH = {
    "q2_min_cost_supplier": Q2_TEMPLATE.format(**_BARE),
    "q11_important_stock": Q11_TEMPLATE.format(**_BARE),
    "q4_late_shipments": Q4_TEMPLATE.format(**_BARE),
    "q7_volume_shipping": Q7_TEMPLATE.format(**_BARE),
    "q8_market_share": Q8_TEMPLATE.format(**_BARE),
    "q9_product_profit": Q9_TEMPLATE.format(**_BARE),
    "q15_top_supplier": Q15_TEMPLATE.format(**_BARE),
    "q20_promo_suppliers": Q20_TEMPLATE.format(**_BARE),
    "q21_latest_shipper": Q21_TEMPLATE.format(**_BARE),
    "q22_dormant_customers": Q22_TEMPLATE.format(**_BARE),
}

ORACLES_TPCH["q6_revenue_band"] = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM({CENTS.format(col='l_extendedprice')} * {PCT}) AS BIGINT)
         AS discount_cc
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND {PCT} BETWEEN 5 AND 7
  AND l_quantity < 24
"""

ORACLES_TPCH["q10_returned_revenue"] = f"""
WITH rev AS (
  SELECT c_custkey, c_name, n_name, {SUM_CC} AS revenue_cc
  FROM lineitem, orders, customer, nation
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n_nationkey
    AND l_returnflag = 'R'
    AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
  GROUP BY c_custkey, c_name, n_name
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue_cc DESC, c_custkey ASC) AS rn
  FROM rev
)
SELECT c_custkey, c_name, n_name, revenue_cc FROM ranked WHERE rn <= 20
"""

ORACLES_TPCH["q12_priority_lines"] = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem, orders
WHERE l_orderkey = o_orderkey AND year(l_shipdate) = 1997
GROUP BY l_linestatus
"""

ORACLES_TPCH["q13_order_distribution"] = """
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
"""

ORACLES_TPCH["q14_promo_share"] = f"""
WITH agg AS (
  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {CC} ELSE 0 END)
              AS BIGINT) AS promo_cc,
         {SUM_CC} AS total_cc
  FROM lineitem, part
  WHERE l_partkey = p_partkey
    AND CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'
)
SELECT promo_cc, total_cc,
       CAST(FLOOR(1000000.0 * promo_cc / total_cc) AS BIGINT) AS promo_micros
FROM agg
"""

ORACLES_TPCH["q16_part_supplier_variety"] = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND p_brand <> 'Brand#5'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p_brand, p_type, p_size
"""

ORACLES_TPCH["q18_large_volume_orders"] = f"""
WITH big AS (
  SELECT l_orderkey, CAST(FLOOR(SUM(l_quantity)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       year(o_orderdate) AS o_year,
       {CENTS.format(col='o_totalprice')} AS price_cents,
       total_qty
FROM big, orders, customer
WHERE big.l_orderkey = o_orderkey AND o_custkey = c_custkey
"""

ORACLES_TPCH["q19_bracketed_revenue"] = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, {SUM_CC} AS revenue_cc
FROM lineitem, part
WHERE l_partkey = p_partkey AND (
     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      AND l_quantity >= 1 AND l_quantity <= 11)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
      AND l_quantity >= 10 AND l_quantity <= 20)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
      AND l_quantity >= 20 AND l_quantity <= 30))
"""
