-- reference: ql/src/test/queries/clientnegative/bad_sample_clause.q (sample-validation family)
-- a sampling percentage above 100 is refused
-- ERROR-CONTAINS: Sampling fraction | must be between | INVALID_FRACTION
SELECT * FROM nation TABLESAMPLE (150 PERCENT);
