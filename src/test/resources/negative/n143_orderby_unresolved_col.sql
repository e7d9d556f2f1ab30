-- reference: ql/src/test/queries/clientnegative/clustern4.q (sort-clause
-- resolution family): ORDER BY naming a column that exists nowhere
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT n_name FROM nation ORDER BY no_col;
