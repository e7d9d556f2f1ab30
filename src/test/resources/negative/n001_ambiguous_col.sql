-- reference: ql/src/test/queries/clientnegative/ambiguous_col.q
-- a subquery exposing two columns under one alias makes the outer
-- reference ambiguous
-- ERROR-CONTAINS: AMBIGUOUS_REFERENCE | is ambiguous
SELECT a.k FROM (SELECT n_nationkey AS k, n_name AS k FROM nation) a;
