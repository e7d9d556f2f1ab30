-- reference: ql/src/test/queries/clientnegative/ptf_negative_DistributeByOrderBy.q
-- DISTRIBUTE BY combines with SORT BY, never ORDER BY
-- ERROR-CONTAINS: UNSUPPORTED_FEATURE | Cannot specify | COMBINATION | PARSE_SYNTAX_ERROR
SELECT n_nationkey FROM nation DISTRIBUTE BY n_regionkey ORDER BY n_nationkey;
