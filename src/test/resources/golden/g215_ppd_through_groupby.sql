-- ppd_gby.q shape: outer filter pushed through an aggregating subquery
SELECT st, n FROM (
  SELECT o_orderstatus AS st, count(*) AS n, min(o_custkey) AS mk
  FROM orders GROUP BY o_orderstatus) g
WHERE st <> 'P' AND mk >= 1
