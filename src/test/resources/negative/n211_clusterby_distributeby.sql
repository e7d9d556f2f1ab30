-- reference: ql/src/test/queries/clientnegative/clusterbydistributeby.q —
-- CLUSTER BY already implies DISTRIBUTE BY; combining them is refused.
-- ERROR-CONTAINS: UNSUPPORTED_FEATURE | not permitted | cannot be used together | COMBINATION_QUERY_RESULT_CLAUSES
SELECT n_name FROM nation CLUSTER BY n_name DISTRIBUTE BY n_name;
