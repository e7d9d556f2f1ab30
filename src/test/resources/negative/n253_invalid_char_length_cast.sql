-- reference: ql/src/test/queries/clientnegative/invalid_char_length_2.q
-- The CHAR length bound applies to CAST targets too, not just DDL.
-- ERROR-CONTAINS: Char length 100000 out of allowed range
SELECT CAST(n_name AS CHAR(100000)) FROM nation LIMIT 1;
