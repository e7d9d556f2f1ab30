-- reference: ql/src/test/queries/clientnegative/windowing_ll_no_over.q
-- lead() demands an OVER clause
-- ERROR-CONTAINS: requires an OVER clause | WINDOW_FUNCTION | window
SELECT lead(n_name, 1) FROM nation;
