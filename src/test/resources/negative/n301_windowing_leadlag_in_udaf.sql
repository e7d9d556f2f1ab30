-- reference: ql/src/test/queries/clientnegative/
-- windowing_leadlag_in_udaf.q — lead() is a window function; wrapping it
-- in a UDAF without any OVER clause is refused.
-- ERROR-CONTAINS: window function | requires an OVER clause | UNSUPPORTED_EXPR_FOR_OPERATOR | not allowed in
SELECT sum(lead(p_retailprice, 1)) AS s1 FROM part;
