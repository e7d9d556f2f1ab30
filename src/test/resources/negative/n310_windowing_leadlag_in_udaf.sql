-- reference: ql/src/test/queries/clientnegative/
-- windowing_leadlag_in_udaf.q — lead() wrapped inside a UDAF with no
-- OVER clause anywhere is refused ("Missing over clause for function"),
-- never evaluated as a plain scalar.
-- ERROR-CONTAINS: window function | over clause | UNSUPPORTED_EXPR
SELECT sum(lead(p_retailprice, 1)) AS s1 FROM part;
