-- smb_mapjoin_4.q: three bucketed-sorted tables chained through mixed
-- join types under the MAPJOIN hint — inner+inner, left+inner,
-- left+left, left+right, left+full all checksummed in one union.
DROP TABLE IF EXISTS g839_b1;
DROP TABLE IF EXISTS g839_b2;
DROP TABLE IF EXISTS g839_b3;
CREATE TABLE g839_b1 (key INT, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key) INTO 1 BUCKETS;
CREATE TABLE g839_b2 (key INT, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key) INTO 1 BUCKETS;
CREATE TABLE g839_b3 (key INT, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key) INTO 1 BUCKETS;
INSERT INTO g839_b1 SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 2 = 0;
INSERT INTO g839_b2 SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 3 = 0;
INSERT INTO g839_b3 SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 5 = 0;
SELECT 'ii' AS tag, count(*) AS n, sum(hash(a.key, c.key)) AS h FROM g839_b1 a
  JOIN g839_b2 b ON a.key = b.key JOIN g839_b3 c ON b.key = c.key
UNION ALL
SELECT 'li', count(*), sum(hash(a.key, c.key)) FROM g839_b1 a
  LEFT OUTER JOIN g839_b2 b ON a.key = b.key JOIN g839_b3 c ON b.key = c.key
UNION ALL
SELECT 'll', count(*), sum(hash(a.key, c.key)) FROM g839_b1 a
  LEFT OUTER JOIN g839_b2 b ON a.key = b.key LEFT OUTER JOIN g839_b3 c ON b.key = c.key
UNION ALL
SELECT 'lr', count(*), sum(hash(a.key, c.key)) FROM g839_b1 a
  LEFT OUTER JOIN g839_b2 b ON a.key = b.key RIGHT OUTER JOIN g839_b3 c ON b.key = c.key
UNION ALL
SELECT 'lf', count(*), sum(hash(a.key, c.key)) FROM g839_b1 a
  LEFT OUTER JOIN g839_b2 b ON a.key = b.key FULL OUTER JOIN g839_b3 c ON b.key = c.key
