-- reference: ql/src/test/queries/clientnegative/clustern4.q
-- (sort-clause validation family): ORDER BY an aggregate over a
-- non-aggregated SELECT
-- ERROR-CONTAINS: UNSUPPORTED_EXPR_FOR_OPERATOR | MISSING_GROUP_BY
SELECT n_name FROM nation ORDER BY max(n_regionkey);
