-- reference: ql/src/test/queries/clientpositive/alter_table_cascade.q —
-- ADD COLUMNS ... CASCADE over existing partitions (incl. the
-- __HIVE_DEFAULT_PARTITION__ slot from a NULL dynamic value): old
-- partitions read NULL for the new column, new writes carry it.
SET hive.exec.dynamic.partition=true;
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1158_c;
CREATE TABLE g1158_c (c1 STRING)
  PARTITIONED BY (p1 STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1158_c PARTITION (p1)
  SELECT n_name, CASE WHEN n_nationkey % 2 = 0 THEN 'abc' ELSE NULL END
  FROM nation WHERE n_nationkey < 6;
ALTER TABLE g1158_c ADD COLUMNS (c2 STRING) CASCADE;
INSERT INTO g1158_c PARTITION (p1='xyz')
  SELECT 'newrow', 'withc2' FROM nation TABLESAMPLE (1 ROWS);
SELECT p1, count(*) AS n, count(c2) AS with_c2, min(c2) AS mn_c2
FROM g1158_c GROUP BY p1
