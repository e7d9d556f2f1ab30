-- reference: ql/src/test/queries/clientnegative/input1.q
-- a star over an undefined table alias
-- ERROR-CONTAINS: cannot be resolved | CANNOT_RESOLVE | UNRESOLVED
SELECT a.* FROM nation;
