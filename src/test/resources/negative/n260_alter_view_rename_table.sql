-- reference: ql/src/test/queries/clientnegative/alter_view_failure8.q
-- ALTER VIEW ... RENAME against a base TABLE is refused (10132).
-- ERROR-CONTAINS: To alter a base table you need to use the ALTER TABLE command
DROP TABLE IF EXISTS neg_avf8_t;
CREATE TABLE neg_avf8_t (foo INT, bar STRING) USING parquet
  PARTITIONED BY (ds STRING);
ALTER VIEW neg_avf8_t RENAME TO neg_avf8_t2;
