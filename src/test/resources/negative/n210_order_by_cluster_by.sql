-- reference: ql/src/test/queries/clientnegative/clustern3.q — ORDER BY
-- and CLUSTER BY on the same query level are mutually exclusive.
-- (Spark's parser rejects the combination outright — a parse refusal is
-- the same observable contract as the reference's semantic one)
-- ERROR-CONTAINS: PARSE_SYNTAX_ERROR | not permitted | cannot be used together | COMBINATION_QUERY_RESULT_CLAUSES
SELECT n_name FROM nation CLUSTER BY n_name ORDER BY n_name;
