-- reference: ql/src/test/queries/clientnegative/ptf_negative_HavingLeadWithNoGBYNoWindowing.q
-- a window function inside HAVING
-- ERROR-CONTAINS: window functions inside HAVING | not allowed to use window
SELECT n_name FROM nation HAVING lead(n_regionkey, 1) OVER (ORDER BY n_name) <= n_regionkey;
