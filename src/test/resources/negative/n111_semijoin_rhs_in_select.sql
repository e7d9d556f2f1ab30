-- reference: ql/src/test/queries/clientnegative/semijoin1.q
-- LEFT SEMI JOIN exposes only the left side; selecting b.* is an error
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT b.n_name FROM nation a LEFT SEMI JOIN nation b ON a.n_regionkey = b.n_regionkey;
