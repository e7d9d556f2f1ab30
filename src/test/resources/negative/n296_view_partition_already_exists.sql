-- reference: metastore AlreadyExistsException parity for view
-- partitions: re-adding an existing spec WITHOUT IF NOT EXISTS refuses.
-- ERROR-CONTAINS: Partition already exists
DROP VIEW IF EXISTS neg296_v;
DROP TABLE IF EXISTS neg296_t;
CREATE TABLE neg296_t (key STRING, ds STRING) USING parquet;
CREATE VIEW neg296_v PARTITIONED ON (ds) AS SELECT key, ds FROM neg296_t;
ALTER VIEW neg296_v ADD PARTITION (ds='1');
ALTER VIEW neg296_v ADD PARTITION (ds='1');
