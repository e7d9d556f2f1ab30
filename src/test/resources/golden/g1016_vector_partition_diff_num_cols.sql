-- vector_partition_diff_num_cols.q: partitions written BEFORE and
-- AFTER an ADD COLUMNS over parquet storage — the early partition
-- reads NULL for the added column, aggregates span both.
DROP TABLE IF EXISTS g1016_t;
CREATE TABLE g1016_t (k INT, s STRING)
  USING parquet PARTITIONED BY (part STRING);
INSERT OVERWRITE TABLE g1016_t PARTITION (part='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey < 5;
ALTER TABLE g1016_t ADD COLUMNS (extra BIGINT);
INSERT OVERWRITE TABLE g1016_t PARTITION (part='2')
  SELECT CAST(n_nationkey AS INT), n_name, CAST(n_nationkey * 10 AS BIGINT)
  FROM nation WHERE n_nationkey < 5;
SELECT part, count(*) AS n, count(extra) AS extra_n,
       CAST(sum(extra) AS BIGINT) AS extra_sum
FROM g1016_t GROUP BY part
