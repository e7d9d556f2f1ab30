-- alter_rename_partition.q: RENAME TO PARTITION moves the data to the
-- new spec (old spec reads empty, new spec reads the rows), with ':' in
-- the partition VALUES exercising path escaping, and a second-level
-- partition column along for the ride.
DROP TABLE IF EXISTS g896_arp;
CREATE TABLE g896_arp (col1 STRING)
  USING parquet PARTITIONED BY (pcol1 STRING, pcol2 STRING);
INSERT OVERWRITE TABLE g896_arp PARTITION (pcol1='old_part1:', pcol2='old_part2:')
  SELECT r_name FROM region;
ALTER TABLE g896_arp PARTITION (pcol1='old_part1:', pcol2='old_part2:')
  RENAME TO PARTITION (pcol1='new_part1:', pcol2='new_part2:');
SELECT
  (SELECT count(*) FROM g896_arp WHERE pcol1='old_part1:' AND pcol2='old_part2:') AS old_rows,
  (SELECT count(*) FROM g896_arp WHERE pcol1='new_part1:' AND pcol2='new_part2:') AS new_rows,
  (SELECT min(col1) FROM g896_arp WHERE pcol1='new_part1:') AS mn
