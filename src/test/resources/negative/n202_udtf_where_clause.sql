-- reference: ql/src/test/queries/clientnegative/udtf_invalid_place.q —
-- a table-generating function cannot appear outside the SELECT list.
-- ERROR-CONTAINS: UNSUPPORTED_GENERATOR | outside the SELECT clause | Generators are not supported
SELECT n_name FROM nation WHERE explode(array(1, 2)) = 1;
