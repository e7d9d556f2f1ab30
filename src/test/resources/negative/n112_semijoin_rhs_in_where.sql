-- reference: ql/src/test/queries/clientnegative/semijoin2.q
-- rhs of a LEFT SEMI JOIN referenced in the outer WHERE
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT a.n_name FROM nation a LEFT SEMI JOIN region b ON a.n_regionkey = b.r_regionkey WHERE b.r_name = 'ASIA';
