-- reference: ql/src/test/queries/clientnegative/split_sample_out_of_range.q
-- — TABLESAMPLE above 100 percent refuses.
-- ERROR-CONTAINS: percent | 100 | between 0 and 100
SELECT n_nationkey FROM nation TABLESAMPLE (105 PERCENT);
