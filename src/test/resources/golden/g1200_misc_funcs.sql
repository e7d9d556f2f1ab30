-- reference: ql/src/test/queries/clientpositive/bool_literal.q +
-- split.q + expr_cached.q + udf_current_user.q — TRUE/FALSE literals
-- in every position, split() battery, a repeated subexpression, and
-- current_user() (the engine session identity, stable in-harness).
SELECT TRUE AS t, FALSE AS f, NOT TRUE AS nt,
       TRUE AND FALSE AS af, TRUE OR FALSE AS orf,
       split('a,b,c', ',') [1] AS s1,
       size(split('one:two:three', ':')) AS s2,
       split('abc', '') [0] AS s3,
       (n_nationkey + 1) * (n_nationkey + 1) AS squared,
       length(current_user()) > 0 AS has_user
FROM nation TABLESAMPLE (1 ROWS)
