-- reference: ql/src/test/queries/clientnegative/lateral_view_join.q (resolution family)
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved | cannot resolve
SELECT no_such_col FROM nation LATERAL VIEW explode(array(1,2)) t AS x;
