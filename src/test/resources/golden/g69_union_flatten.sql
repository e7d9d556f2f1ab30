SELECT k, cnt FROM (
  SELECT n_regionkey AS k, count(*) AS cnt FROM nation GROUP BY n_regionkey
  UNION DISTINCT
  SELECT r_regionkey AS k, count(*) AS cnt FROM region GROUP BY r_regionkey
  UNION ALL
  SELECT 99 AS k, 0 AS cnt) u
