-- reference: ql/src/test/queries/clientnegative/uniquejoin2.q — a
-- UNIQUEJOIN whose sides list DIFFERENT key counts refuses: the join
-- key tuple must be uniform.
-- ERROR-CONTAINS: UNIQUEJOIN | key | arity | same number
FROM UNIQUEJOIN nation a (a.n_nationkey),
     PRESERVE nation b (b.n_nationkey, b.n_name)
SELECT a.n_nationkey, b.n_nationkey;
