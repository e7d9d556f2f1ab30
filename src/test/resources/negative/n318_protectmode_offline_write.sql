-- reference: ql/src/test/queries/clientnegative/protectmode_tbl5.q —
-- OFFLINE blocks WRITES too: an INSERT OVERWRITE into an offline
-- partitioned table is refused, even toward a not-yet-existing
-- partition.
-- ERROR-CONTAINS: offline table or partition
DROP TABLE IF EXISTS neg_pm5;
DROP TABLE IF EXISTS neg_pm5_src;
CREATE TABLE neg_pm5_src (col STRING) USING parquet;
CREATE TABLE neg_pm5 (col STRING) USING parquet PARTITIONED BY (p STRING);
ALTER TABLE neg_pm5 ADD PARTITION (p='p1');
ALTER TABLE neg_pm5 ENABLE NO_DROP;
ALTER TABLE neg_pm5 ENABLE OFFLINE;
ALTER TABLE neg_pm5 DISABLE NO_DROP;
INSERT OVERWRITE TABLE neg_pm5 PARTITION (p='not_exist') SELECT col FROM neg_pm5_src;
