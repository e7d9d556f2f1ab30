-- reference: ql/src/test/queries/clientnegative/create_or_replace_view4.q
-- (+ create_or_replace_view5.q, create_or_replace_view7.q,
-- create_or_replace_view8.q: IF NOT EXISTS / transitive / self-ref) —
-- a view that HAS partitions cannot be redefined; the recorded specs
-- would be orphaned (DDLSemanticAnalyzer error 10217).
-- ERROR-CONTAINS: 10217 | has partitions | drop the partitions first
DROP VIEW IF EXISTS neg_crv4_v;
DROP TABLE IF EXISTS neg_crv4_base;
CREATE TABLE neg_crv4_base (x STRING, ds STRING, hr STRING) USING parquet;
CREATE VIEW neg_crv4_v PARTITIONED ON (ds, hr)
  AS SELECT x, ds, hr FROM neg_crv4_base;
ALTER VIEW neg_crv4_v ADD PARTITION (ds='1', hr='1');
CREATE OR REPLACE VIEW neg_crv4_v PARTITIONED ON (ds, hr)
  AS SELECT ds, hr FROM neg_crv4_base;
