-- reference: ql/src/test/queries/clientnegative/unionOrderBy.q (+
-- unionClusterBy/unionDistributeBy/unionSortBy) — ORDER BY (and the
-- cluster/distribute/sort clauses) can only apply to the WHOLE union,
-- not an unparenthesized branch.
-- ERROR-CONTAINS: union | UNION | syntax | parse
SELECT n_nationkey FROM nation ORDER BY n_nationkey
UNION ALL
SELECT n_nationkey FROM nation;
