-- reference: ql/src/test/queries/clientnegative/union2.q (type-compat family)
-- an array column cannot union with a map column
-- ERROR-CONTAINS: INCOMPATIBLE_COLUMN_TYPE | incompatible
SELECT array(1) AS c UNION ALL SELECT map('a', 1) AS c;
