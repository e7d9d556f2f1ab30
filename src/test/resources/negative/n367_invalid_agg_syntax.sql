-- reference: ql/src/test/queries/clientnegative/invalid_max_syntax.q
-- (+ invalid_min_syntax.q, invalid_std_syntax.q,
-- invalid_stddev_samp_syntax.q, invalid_var_samp_syntax.q,
-- invalid_variance_syntax.q) — star inside a one-argument aggregate
-- refuses (count is the only star aggregate).
-- ERROR-CONTAINS: max | invalid | *
SELECT max(*) FROM nation;
