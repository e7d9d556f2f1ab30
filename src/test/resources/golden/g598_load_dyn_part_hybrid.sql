-- load_dyn_part8.q: HYBRID spec — first partition column static, second
-- dynamic, in one INSERT; the static value applies to every row.
DROP TABLE IF EXISTS g598_t;
CREATE TABLE g598_t (k INT) USING parquet PARTITIONED BY (ds STRING, hr INT);
INSERT OVERWRITE TABLE g598_t PARTITION (ds='2008-04-08', hr)
  SELECT n_nationkey, CAST(n_regionkey AS INT) FROM nation;
INSERT INTO TABLE g598_t PARTITION (ds='2008-04-09', hr=11)
  SELECT n_nationkey FROM nation WHERE n_nationkey < 2;
SELECT ds, hr, COUNT(*) AS n, SUM(k) AS sum_k FROM g598_t GROUP BY ds, hr
