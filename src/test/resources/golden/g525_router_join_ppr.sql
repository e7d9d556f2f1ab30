-- router_join_ppr.q: the RIGHT OUTER mirror of louter_join_ppr — the
-- preserved side flips, so the same four predicate placements must flip
-- which rows survive unmatched. Tagged variants over one partitioned pair.
DROP TABLE IF EXISTS g525_src;
DROP TABLE IF EXISTS g525_srcpart;
CREATE TABLE g525_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
CREATE TABLE g525_srcpart (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g525_srcpart PARTITION (ds='2008-04-08')
  SELECT key, value FROM g525_src WHERE key BETWEEN 8 AND 20;
INSERT INTO g525_srcpart PARTITION (ds='2008-04-09')
  SELECT key, value FROM g525_src WHERE key BETWEEN 8 AND 20;
SELECT 'on_preserved_right' AS v, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g525_src a RIGHT OUTER JOIN g525_srcpart b
  ON (a.key = b.key AND b.ds = '2008-04-08')
WHERE b.key > 5 AND b.key < 15
UNION ALL
SELECT 'on_nonpreserved_left', a.key, a.value, b.key, b.value
FROM g525_srcpart a RIGHT OUTER JOIN g525_src b
  ON (a.key = b.key AND a.ds = '2008-04-08')
WHERE b.key > 5 AND b.key < 15
UNION ALL
SELECT 'where_converts', a.key, a.value, b.key, b.value
FROM g525_srcpart a RIGHT OUTER JOIN g525_src b ON (a.key = b.key)
WHERE b.key > 5 AND b.key < 15 AND a.ds = '2008-04-08'
UNION ALL
SELECT 'where_on_preserved', a.key, a.value, b.key, b.value
FROM g525_src a RIGHT OUTER JOIN g525_srcpart b ON (a.key = b.key)
WHERE b.key > 9 AND b.key < 13 AND b.ds = '2008-04-08'
