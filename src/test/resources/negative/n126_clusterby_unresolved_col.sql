-- reference: ql/src/test/queries/clientnegative/clustern2.q
-- CLUSTER BY naming a column that exists nowhere
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT n_name FROM nation CLUSTER BY no_col;
