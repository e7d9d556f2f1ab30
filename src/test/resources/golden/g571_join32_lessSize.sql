-- join32_lessSize.q: a three-table chain where the partitioned leg's
-- partition predicates live INSIDE the inner join's ON clause (z.ds/z.hr
-- constants) — they must prune partitions, not just filter rows; run as
-- INSERT OVERWRITE twice (idempotent overwrite) then read back.
DROP TABLE IF EXISTS g571_src;
DROP TABLE IF EXISTS g571_src1;
DROP TABLE IF EXISTS g571_srcpart;
DROP TABLE IF EXISTS g571_dest;
CREATE TABLE g571_src USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, concat('val_', n_nationkey % 5) AS value FROM nation;
CREATE TABLE g571_src1 USING parquet AS
  SELECT key, value FROM g571_src WHERE CAST(key AS INT) % 3 = 0;
CREATE TABLE g571_srcpart (key STRING, value STRING) PARTITIONED BY (ds STRING, hr INT);
INSERT INTO g571_srcpart PARTITION (ds='2008-04-08', hr=11)
  SELECT key, value FROM g571_src;
INSERT INTO g571_srcpart PARTITION (ds='2008-04-09', hr=12)
  SELECT key, concat(value, '_x') FROM g571_src;
CREATE TABLE g571_dest (key STRING, value STRING, val2 STRING) USING parquet;
INSERT OVERWRITE TABLE g571_dest
SELECT x.key, z.value, y.value
FROM g571_src1 x JOIN g571_src y ON (x.key = y.key)
JOIN g571_srcpart z ON (x.value = z.value AND z.ds = '2008-04-08' AND z.hr = 11);
INSERT OVERWRITE TABLE g571_dest
SELECT x.key, z.value, y.value
FROM g571_src1 x JOIN g571_src y ON (x.key = y.key)
JOIN g571_srcpart z ON (x.value = z.value AND z.ds = '2008-04-08' AND z.hr = 11);
SELECT key, value, val2, count(*) AS n FROM g571_dest GROUP BY key, value, val2
