-- louter_join_ppr.q (outer join × partition pruning): an ON partition
-- predicate on the NON-preserved side prunes that side's partitions but
-- never drops preserved rows; the SAME predicate on the PRESERVED side in
-- ON gates matches only (rows survive with NULL match); in WHERE it
-- null-filters and effectively converts the join. Four variants, tagged.
DROP TABLE IF EXISTS g524_src;
DROP TABLE IF EXISTS g524_srcpart;
CREATE TABLE g524_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
CREATE TABLE g524_srcpart (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g524_srcpart PARTITION (ds='2008-04-08')
  SELECT key, value FROM g524_src WHERE key BETWEEN 8 AND 20;
INSERT INTO g524_srcpart PARTITION (ds='2008-04-09')
  SELECT key, value FROM g524_src WHERE key BETWEEN 8 AND 20;
SELECT 'on_nonpreserved' AS v, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g524_src a LEFT OUTER JOIN g524_srcpart b
  ON (a.key = b.key AND b.ds = '2008-04-08')
WHERE a.key > 5 AND a.key < 15 AND b.key > 9 AND b.key < 13
UNION ALL
SELECT 'on_preserved', a.key, a.value, b.key, b.value
FROM g524_srcpart a LEFT OUTER JOIN g524_src b
  ON (a.key = b.key AND a.ds = '2008-04-08')
WHERE a.key > 5 AND a.key < 15 AND b.key > 9 AND b.key < 13
UNION ALL
SELECT 'where_nonpreserved', a.key, a.value, b.key, b.value
FROM g524_src a LEFT OUTER JOIN g524_srcpart b ON (a.key = b.key)
WHERE a.key > 5 AND a.key < 15 AND b.key > 9 AND b.key < 13
  AND b.ds = '2008-04-08'
UNION ALL
SELECT 'where_preserved', a.key, a.value, b.key, b.value
FROM g524_srcpart a LEFT OUTER JOIN g524_src b ON (a.key = b.key)
WHERE a.key > 5 AND a.key < 15 AND b.key > 9 AND b.key < 13
  AND a.ds = '2008-04-08'
