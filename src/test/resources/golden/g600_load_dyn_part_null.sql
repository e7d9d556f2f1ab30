-- load_dyn_part14.q: NULL and empty-string dynamic partition values land
-- in the default partition (__HIVE_DEFAULT_PARTITION__) and read back as
-- NULL partition values.
DROP TABLE IF EXISTS g600_t;
CREATE TABLE g600_t (k INT) USING parquet PARTITIONED BY (p STRING);
INSERT OVERWRITE TABLE g600_t PARTITION (p)
  SELECT n_nationkey, CASE WHEN n_regionkey = 0 THEN CAST(NULL AS STRING) ELSE CAST(n_regionkey AS STRING) END
  FROM nation;
SELECT COALESCE(p, '<null_part>') AS p_read, COUNT(*) AS n FROM g600_t GROUP BY p
