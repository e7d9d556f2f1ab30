-- reference: ql/src/test/queries/clientnegative/clusterbysortby.q
-- CLUSTER BY already implies the sort; combining it with SORT BY is refused
-- ERROR-CONTAINS: UNSUPPORTED_FEATURE | Cannot specify | COMBINATION | PARSE_SYNTAX_ERROR
SELECT n_nationkey, n_name FROM nation CLUSTER BY n_nationkey SORT BY n_name;
