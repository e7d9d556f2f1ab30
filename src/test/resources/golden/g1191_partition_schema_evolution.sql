-- reference: ql/src/test/queries/clientpositive/partition_schema1.q +
-- partition_vs_table_metadata.q + orc_diff_part_cols2.q — ADD COLUMNS
-- between partition writes: partitions written BEFORE the change read
-- NULL for the new column (parquet and ORC), ones written after carry
-- values.
DROP TABLE IF EXISTS g1191_p;
DROP TABLE IF EXISTS g1191_orc;
CREATE TABLE g1191_p (key STRING, value STRING)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1191_p PARTITION (ds='100')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey < 4;
ALTER TABLE g1191_p ADD COLUMNS (newcol STRING);
INSERT OVERWRITE TABLE g1191_p PARTITION (ds='101')
  SELECT CAST(n_nationkey AS STRING), n_name, CAST(n_nationkey AS STRING)
  FROM nation WHERE n_nationkey < 4;
CREATE TABLE g1191_orc (key STRING) STORED AS ORC;
INSERT OVERWRITE TABLE g1191_orc
  SELECT n_name FROM nation WHERE n_nationkey < 3;
ALTER TABLE g1191_orc ADD COLUMNS (value STRING);
SELECT 'part' AS src, key, newcol FROM g1191_p
UNION ALL
SELECT 'orc', key, value FROM g1191_orc
