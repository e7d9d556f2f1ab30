-- reference: ql/src/test/queries/clientpositive/gby_star.q (+
-- gby_star2.q) — SELECT * alongside aggregates: star expands to the
-- grouping columns, in plain, filtered, derived-table, and joined
-- shapes.
DROP TABLE IF EXISTS g1091_src;
CREATE TABLE g1091_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, n_name AS value FROM nation;
SELECT 'plain' AS tag, key, value, s FROM
  (SELECT *, sum(key) AS s FROM g1091_src GROUP BY key, value LIMIT 10) a
UNION ALL
SELECT 'filtered', key, value, s FROM
  (SELECT *, sum(key) AS s FROM g1091_src WHERE key < 10
   GROUP BY key, value LIMIT 10) b
UNION ALL
SELECT 'joined', key, CAST(NULL AS STRING), s FROM
  (SELECT a.*, sum(g1091_src.key) AS s
   FROM (SELECT key FROM g1091_src WHERE key < 10) a
   INNER JOIN g1091_src ON a.key = g1091_src.key
   GROUP BY a.key LIMIT 10) c
