-- reference: ql/src/test/queries/clientnegative/invalid_t_transform.q
-- DATETIME is not a type: TRANSFORM ... AS (key DATETIME) is refused
-- (the reference says "Please use DATE or TIMESTAMP instead").
-- ERROR-CONTAINS: DATETIME | PARSE_SYNTAX_ERROR | UNSUPPORTED_DATATYPE
SELECT TRANSFORM(n_name) USING 'cat' AS (key DATETIME) FROM nation;
