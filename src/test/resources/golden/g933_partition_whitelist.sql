-- add_partition_with_whitelist.q (positive leg): with
-- hive.metastore.partition.name.whitelist.pattern set to letters-only,
-- a letters-only partition value is accepted (the comma value is the
-- n274 refusal); unsetting the pattern turns the gate off.
SET hive.metastore.partition.name.whitelist.pattern=[A-Za-z]*;
DROP TABLE IF EXISTS g933_wl;
CREATE TABLE g933_wl (key STRING) USING parquet PARTITIONED BY (ds STRING);
ALTER TABLE g933_wl ADD PARTITION (ds='Part');
INSERT INTO g933_wl PARTITION (ds='Part') VALUES ('a'), ('b');
-- dynamic leg (dynamic_partitions_with_whitelist.q's accepted shape):
-- data-derived values that PASS the pattern write through the one-pass
-- staging; a '9'-bearing value is the n276 refusal
INSERT INTO g933_wl PARTITION (ds) SELECT 'c', 'Dyn';
SET hive.metastore.partition.name.whitelist.pattern=;
SELECT ds, count(*) AS n FROM g933_wl GROUP BY ds ORDER BY ds
