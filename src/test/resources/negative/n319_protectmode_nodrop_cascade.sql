-- reference: ql/src/test/queries/clientnegative/protectmode_tbl6.q
-- (NO_DROP CASCADE blocks DROP TABLE) + tbl7.q/tbl8.q (CASCADE blocks
-- partition drops added before OR after the ALTER).
-- ERROR-CONTAINS: protected from being dropped
DROP TABLE IF EXISTS neg_pm6;
CREATE TABLE neg_pm6 (col STRING) USING parquet PARTITIONED BY (p STRING);
ALTER TABLE neg_pm6 ADD PARTITION (p='p1');
ALTER TABLE neg_pm6 ENABLE NO_DROP CASCADE;
ALTER TABLE neg_pm6 ADD PARTITION (p='p2');
ALTER TABLE neg_pm6 DROP PARTITION (p='p2');
