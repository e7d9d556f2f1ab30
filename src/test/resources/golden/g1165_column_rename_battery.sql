-- reference: ql/src/test/queries/clientpositive/column_rename3.q +
-- column_rename4.q + column_rename5.q — CHANGE COLUMN renames: in
-- place, with FIRST/AFTER reposition, and on a partitioned table whose
-- old files carry the old name.
DROP TABLE IF EXISTS g1165_t;
CREATE TABLE g1165_t (a INT, b STRING, c DOUBLE)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1165_t PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name, CAST(n_regionkey AS DOUBLE)
  FROM nation WHERE n_nationkey < 5;
ALTER TABLE g1165_t CHANGE COLUMN b renamed_b STRING;
ALTER TABLE g1165_t CHANGE COLUMN a a2 INT;
INSERT INTO g1165_t PARTITION (ds='2')
  SELECT 100, 'post_rename', 9.5 FROM nation TABLESAMPLE (1 ROWS);
SELECT ds, a2, renamed_b, c FROM g1165_t
