-- union_date.q shape: UNION of DATE with STRING branches (Hive unifies to
-- string), and date vs timestamp unification
SELECT d, tag FROM (
  SELECT o_orderdate AS d, 'date' AS tag FROM orders WHERE o_orderkey <= 16
  UNION ALL
  SELECT '2099-01-01', 'str' FROM region WHERE r_regionkey = 0
) u
UNION ALL
SELECT cast(dt AS string), 'dt_ts' FROM (
  SELECT cast(o_orderdate AS timestamp) AS dt FROM orders WHERE o_orderkey <= 8
  UNION ALL
  SELECT cast('2099-01-01 12:34:56' AS timestamp) FROM region WHERE r_regionkey = 0
) v
