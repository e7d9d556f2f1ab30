-- reference: ql/src/test/queries/clientnegative/invalid_varchar_length_2.q
-- (+ invalid_varchar_length_3.q) — VARCHAR beyond 65535 refuses.
-- ERROR-CONTAINS: varchar | 65535 | length
SELECT CAST(n_name AS VARCHAR(100000)) FROM nation LIMIT 1;
