-- sample2.q/sample4.q shape: ON-less TABLESAMPLE(BUCKET x OUT OF y) must
-- resolve the table's CLUSTERED BY columns (deterministic bucket
-- membership), not Spark's random row fraction
DROP TABLE IF EXISTS g362_srcbucket;
CREATE TABLE g362_srcbucket (key BIGINT, value STRING) USING parquet
CLUSTERED BY (key) INTO 2 BUCKETS;
INSERT OVERWRITE TABLE g362_srcbucket
SELECT n_nationkey, n_name FROM nation;
SELECT s.key, s.value FROM g362_srcbucket TABLESAMPLE (BUCKET 1 OUT OF 2) s
UNION ALL
SELECT s.key, s.value FROM g362_srcbucket TABLESAMPLE (BUCKET 2 OUT OF 2) s
