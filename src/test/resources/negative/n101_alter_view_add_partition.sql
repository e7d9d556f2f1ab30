-- reference: ql/src/test/queries/clientnegative/alter_view_failure* —
-- table-only ALTER operations on a VIEW are refused
-- ERROR-CONTAINS: EXPECT_TABLE_NOT_VIEW | view | not supported
CREATE OR REPLACE TEMPORARY VIEW neg_avp AS SELECT 1 AS v;
ALTER TABLE neg_avp ADD PARTITION (p='a');
