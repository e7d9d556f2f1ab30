-- reference: ql/src/test/queries/clientnegative/alter_view_failure3.q
-- ALTER VIEW ... ADD PARTITION against a base TABLE is refused toward
-- the ALTER TABLE form (SemanticException 10132).
-- ERROR-CONTAINS: To alter a base table you need to use the ALTER TABLE command
DROP TABLE IF EXISTS neg_avf3_t;
CREATE TABLE neg_avf3_t (k INT) USING parquet PARTITIONED BY (ds STRING);
ALTER VIEW neg_avf3_t ADD PARTITION (ds='2012-12-31');
