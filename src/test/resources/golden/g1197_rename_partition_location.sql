-- reference: ql/src/test/queries/clientpositive/
-- rename_partition_location.q (+ rename_table_location.q,
-- rename_external_partition_location.q shapes) — after the TABLE's
-- location is re-pointed, renaming a partition must keep the
-- partition's DATA reachable (the old-location files move with it).
DROP TABLE IF EXISTS g1197_rp;
CREATE TABLE g1197_rp (key STRING, value STRING)
  PARTITIONED BY (part STRING) STORED AS PARQUET
  LOCATION '${GOLDTMP}/rename_partition_table';
INSERT OVERWRITE TABLE g1197_rp PARTITION (part='1')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
ALTER TABLE g1197_rp SET LOCATION '${GOLDTMP}/rename_partition_table_moved';
ALTER TABLE g1197_rp PARTITION (part='1') RENAME TO PARTITION (part='2');
SELECT count(*) AS n FROM g1197_rp WHERE part = '2'
