-- reference: ql/src/test/queries/clientnegative/alter_view_failure7.q
-- The ADD PARTITION spec must bind ALL of the view's partition columns.
-- ERROR-CONTAINS: doesn't contain all (2) partition columns
DROP VIEW IF EXISTS neg_avf7_v;
DROP TABLE IF EXISTS neg_avf7_t;
CREATE TABLE neg_avf7_t (k INT, ds STRING, hr STRING) USING parquet;
CREATE VIEW neg_avf7_v PARTITIONED ON (ds, hr) AS
SELECT k, ds, hr FROM neg_avf7_t;
ALTER VIEW neg_avf7_v ADD PARTITION (ds='2011-01-01');
