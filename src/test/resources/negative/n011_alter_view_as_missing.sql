-- reference: ql/src/test/queries/clientnegative/alter_view_as_select_not_exist.q
-- ERROR-CONTAINS: TABLE_OR_VIEW_NOT_FOUND | cannot be found
ALTER VIEW neg_no_such_view_xyz AS SELECT n_nationkey FROM nation;
