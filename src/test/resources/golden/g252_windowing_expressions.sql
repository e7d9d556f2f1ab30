-- windowing_expressions.q: windows inside arithmetic and CASE
SELECT s_suppkey,
  round((sum(s_acctbal) OVER (PARTITION BY s_nationkey) -
         avg(s_acctbal) OVER (PARTITION BY s_nationkey)) * 100) / 100 AS spread,
  CASE WHEN s_acctbal > avg(s_acctbal) OVER (PARTITION BY s_nationkey)
       THEN 'above' ELSE 'at_or_below' END AS side
FROM supplier
