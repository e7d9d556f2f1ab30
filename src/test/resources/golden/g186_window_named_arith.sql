-- windowing_windowspec.q HIVE-9228: arithmetic over one named window, projected away
SELECT s, i FROM (
  SELECT s_name AS s, s_suppkey AS i,
    round(((avg(s_acctbal) OVER w1) + 10.0) - ((avg(s_acctbal) OVER w1) - 10.0), 2) AS r
  FROM supplier WINDOW w1 AS (PARTITION BY s_nationkey ORDER BY s_suppkey)) X
ORDER BY i LIMIT 7
