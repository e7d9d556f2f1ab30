-- reference: ql/src/test/queries/clientnegative/alter_partition_change_col_dup_col.q
-- CHANGE COLUMN renaming c2 to an EXISTING column name c1 must refuse
-- (duplicate column), not silently produce two c1 columns.
-- ERROR-CONTAINS: duplicate | already exists | ambiguous | AMBIGUOUS
DROP TABLE IF EXISTS neg_dupcol;
CREATE TABLE neg_dupcol (c1 STRING, c2 DECIMAL(10,0))
  USING parquet PARTITIONED BY (p1 STRING);
ALTER TABLE neg_dupcol ADD PARTITION (p1='abc');
ALTER TABLE neg_dupcol CHANGE c2 c1 DECIMAL(14,4);
