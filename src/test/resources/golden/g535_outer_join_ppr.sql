-- outer_join_ppr.q: FULL OUTER join × partition predicate placement. In
-- ON, the partition filter prunes only that side's contribution to MATCHES
-- (unmatched rows from BOTH sides survive with NULLs); in WHERE it
-- null-filters the partitioned side and collapses the join to an inner
-- over one partition. Both variants over the same range filters.
DROP TABLE IF EXISTS g535_src;
DROP TABLE IF EXISTS g535_srcpart;
CREATE TABLE g535_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
CREATE TABLE g535_srcpart (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g535_srcpart PARTITION (ds='2008-04-08')
  SELECT key, concat(value, '_a') FROM g535_src WHERE key BETWEEN 12 AND 22;
INSERT INTO g535_srcpart PARTITION (ds='2008-04-09')
  SELECT key, concat(value, '_b') FROM g535_src WHERE key BETWEEN 12 AND 22;
SELECT 'on_clause' AS v, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g535_src a FULL OUTER JOIN g535_srcpart b
  ON (a.key = b.key AND b.ds = '2008-04-08')
WHERE a.key > 10 AND a.key < 20 AND b.key > 15 AND b.key < 25
UNION ALL
SELECT 'where_clause', a.key, a.value, b.key, b.value
FROM g535_src a FULL OUTER JOIN g535_srcpart b ON (a.key = b.key)
WHERE a.key > 10 AND a.key < 20 AND b.key > 15 AND b.key < 25
  AND b.ds = '2008-04-08'
