-- reference: ql/src/test/queries/clientnegative/windowing_invalid_udaf.q
-- an OVER clause on a function that does not exist
-- ERROR-CONTAINS: UNRESOLVED_ROUTINE | Cannot resolve routine
SELECT nonexistfunc(n_nationkey) OVER () FROM nation;
