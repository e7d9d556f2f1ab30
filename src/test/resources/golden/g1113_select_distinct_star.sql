-- reference: ql/src/test/queries/clientpositive/selectDistinctStar.q —
-- DISTINCT * in the qualified, bare, filtered, FROM-first, union-dedup,
-- and view-with-order-limit shapes.
DROP VIEW IF EXISTS g1113_sdi;
DROP TABLE IF EXISTS g1113_src;
CREATE TABLE g1113_src USING parquet AS
  SELECT CAST(n_nationkey % 5 AS INT) AS key, concat('v', n_regionkey) AS value
  FROM nation;
CREATE VIEW g1113_sdi AS
  SELECT DISTINCT * FROM g1113_src ORDER BY key LIMIT 2;
SELECT 'qual' AS tag, CAST(count(*) AS INT) AS n FROM
  (SELECT DISTINCT s.* FROM g1113_src s) a
UNION ALL
SELECT 'filtered', CAST(count(*) AS INT) FROM
  (SELECT DISTINCT * FROM g1113_src WHERE key < 3) b
UNION ALL
SELECT 'from_first', CAST(count(*) AS INT) FROM
  (FROM g1113_src a SELECT DISTINCT a.* WHERE a.key = 2) c
UNION ALL
SELECT 'union_dedup', CAST(count(*) AS INT) FROM
  (SELECT DISTINCT * FROM
    (SELECT * FROM g1113_src UNION ALL SELECT * FROM g1113_src) u) d
UNION ALL
SELECT 'view_limit2', CAST(count(*) AS INT) FROM g1113_sdi
