-- reference: ql/src/test/queries/clientpositive/inputddl1.q + inputddl2.q
-- + inputddl3.q — CREATE with multi-column PARTITIONED BY, then DESCRIBE:
-- partition columns list after the data columns, with the # Partition
-- Information block separating them.
DROP TABLE IF EXISTS g1038_ddl2;
CREATE TABLE g1038_ddl2 (key INT, value STRING)
  USING parquet PARTITIONED BY (ds STRING, country STRING);
DESCRIBE g1038_ddl2;
