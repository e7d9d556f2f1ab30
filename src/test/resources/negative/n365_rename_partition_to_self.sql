-- reference: ql/src/test/queries/clientnegative/
-- alter_rename_partition_failure2.q — RENAME PARTITION to its own spec
-- refuses: the target partition already exists.
-- ERROR-CONTAINS: already exist | ALREADY_EXIST
DROP TABLE IF EXISTS neg365_arp;
CREATE TABLE neg365_arp (col1 STRING)
  PARTITIONED BY (pcol1 STRING, pcol2 STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE neg365_arp PARTITION (pcol1='old_part1:', pcol2='old_part2:')
  SELECT n_name FROM nation TABLESAMPLE (2 ROWS);
ALTER TABLE neg365_arp PARTITION (pcol1='old_part1:', pcol2='old_part2:')
  RENAME TO PARTITION (pcol1='old_part1:', pcol2='old_part2:');
