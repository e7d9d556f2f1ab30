-- windowing_windowspec.q shapes: RANGE current-row-to-unbounded-following,
-- ROWS current-to-N-following, DESC order with symmetric ROWS frame, and a
-- named WINDOW spec reused inside arithmetic
SELECT o_custkey,
  sum(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_custkey, o_totalprice ROWS UNBOUNDED PRECEDING) AS a,
  sum(o_totalprice) OVER (PARTITION BY o_orderdate ORDER BY o_totalprice RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS b,
  avg(o_totalprice) OVER (PARTITION BY o_orderdate ORDER BY o_custkey, o_totalprice ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS c,
  avg(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_custkey, o_totalprice DESC ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS d,
  round(((avg(o_totalprice) OVER w1 + 10.0) - (avg(o_totalprice) OVER w1 - 10.0)) * 100) / 100 AS e
FROM orders
WINDOW w1 AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
ORDER BY o_orderkey
LIMIT 40
