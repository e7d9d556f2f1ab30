-- reference: ql/src/test/queries/clientnegative/alter_view_failure5.q
-- The ADD PARTITION spec must name the view's PARTITIONED ON columns;
-- a stray name is refused.
-- ERROR-CONTAINS: contains non-partition columns
DROP VIEW IF EXISTS neg_avf5_v;
DROP TABLE IF EXISTS neg_avf5_t;
CREATE TABLE neg_avf5_t (k INT, v STRING) USING parquet;
CREATE VIEW neg_avf5_v PARTITIONED ON (v) AS SELECT k, v FROM neg_avf5_t;
ALTER VIEW neg_avf5_v ADD PARTITION (x='val_86');
