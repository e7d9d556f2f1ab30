-- reference: ql/src/test/queries/clientnegative/invalid_t_create2-style
-- field access on a scalar column (SemanticAnalyzer: '.' over non-struct)
-- ERROR-CONTAINS: FIELD_NOT_FOUND | INVALID_EXTRACT | need struct type | can't extract
SELECT n_name.f1 FROM nation;
