-- smb_mapjoin_7.q shape: union of two sort-merge-bucket joins inserted
-- into a bucketed output table, then read back.
DROP TABLE IF EXISTS g435_b1;
DROP TABLE IF EXISTS g435_b2;
DROP TABLE IF EXISTS g435_out;
CREATE TABLE g435_b1 (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE g435_b2 (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE g435_out (k1 INT, v1 STRING, k2 INT, v2 STRING) STORED AS PARQUET;
INSERT INTO g435_b1 VALUES (1,'v1'), (3,'v3'), (4,'v4'), (5,'v5'), (10,'v10');
INSERT INTO g435_b2 VALUES (1,'w1'), (4,'w4'), (7,'w7'), (10,'w10'), (20,'w20');
INSERT OVERWRITE TABLE g435_out
SELECT * FROM (
  SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value AS v2
  FROM g435_b1 a JOIN g435_b2 b ON a.key = b.key
  UNION ALL
  SELECT a.key, a.value, b.key, b.value
  FROM g435_b1 a LEFT OUTER JOIN g435_b2 b ON a.key = b.key
) u;
SELECT k1, v1, k2, v2 FROM g435_out
