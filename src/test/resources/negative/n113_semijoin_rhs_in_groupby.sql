-- reference: ql/src/test/queries/clientnegative/semijoin3.q
-- rhs of a LEFT SEMI JOIN referenced in GROUP BY
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT count(*) FROM nation a LEFT SEMI JOIN region b ON a.n_regionkey = b.r_regionkey GROUP BY b.r_name;
