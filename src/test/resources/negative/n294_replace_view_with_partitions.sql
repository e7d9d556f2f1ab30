-- reference: ql/src/test/queries/clientnegative/create_or_replace_view2.q
-- A view that HAS partitions cannot be redefined (error 10217) — the
-- new definition would orphan the recorded specs; drop them first.
-- ERROR-CONTAINS: if the view has partitions
DROP VIEW IF EXISTS neg294_v;
DROP TABLE IF EXISTS neg294_t;
CREATE TABLE neg294_t (key STRING, ds STRING, hr STRING) USING parquet;
CREATE VIEW neg294_v PARTITIONED ON (ds, hr)
  AS SELECT key, ds, hr FROM neg294_t;
ALTER VIEW neg294_v ADD PARTITION (ds='1', hr='2');
CREATE OR REPLACE VIEW neg294_v PARTITIONED ON (hr)
  AS SELECT key, hr FROM neg294_t;
