-- reference: ql/src/test/queries/clientnegative/date_literal2.q
-- ERROR-CONTAINS: INVALID_TYPED_LITERAL | CAST_INVALID_INPUT | invalid date
SELECT DATE '2001-01-32' FROM nation LIMIT 1;
