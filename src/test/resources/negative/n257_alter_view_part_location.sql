-- reference: ql/src/test/queries/clientnegative/alter_view_failure4.q
-- A view partition has no storage: LOCATION on ALTER VIEW ADD PARTITION
-- is illegal.
-- ERROR-CONTAINS: LOCATION clause illegal for view partition
DROP VIEW IF EXISTS neg_avf4_v;
DROP TABLE IF EXISTS neg_avf4_t;
CREATE TABLE neg_avf4_t (k INT, v STRING) USING parquet;
CREATE VIEW neg_avf4_v PARTITIONED ON (v) AS SELECT k, v FROM neg_avf4_t;
ALTER VIEW neg_avf4_v ADD PARTITION (v='val_86') LOCATION '/foo/bar/baz';
