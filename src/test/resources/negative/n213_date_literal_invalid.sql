-- reference: ql/src/test/queries/clientnegative/date_literal3.q — an
-- out-of-range DATE literal is a compile-time error, not a NULL.
-- ERROR-CONTAINS: INVALID_TYPED_LITERAL | invalid | cannot be cast
SELECT DATE '2011-01-32' FROM nation LIMIT 1;
