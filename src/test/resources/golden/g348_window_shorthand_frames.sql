-- cbo_windowing.q shape: shorthand frame specs without BETWEEN
-- (ROWS UNBOUNDED PRECEDING / ROWS CURRENT ROW / ROWS 1 PRECEDING /
--  RANGE UNBOUNDED PRECEDING)
SELECT n_nationkey,
  max(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_name ROWS UNBOUNDED PRECEDING) AS a,
  min(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_name ROWS CURRENT ROW) AS b,
  count(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_name ROWS 1 PRECEDING) AS c,
  sum(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_name RANGE UNBOUNDED PRECEDING) AS d
FROM nation
