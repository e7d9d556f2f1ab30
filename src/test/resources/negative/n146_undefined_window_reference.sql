-- reference: ql/src/test/queries/clientnegative/ptf_negative_AmbiguousWindowDefn.q
-- OVER naming a window the WINDOW clause never defines
-- ERROR-CONTAINS: MISSING_WINDOW_SPECIFICATION | not defined in the WINDOW clause
SELECT sum(o_totalprice) OVER w9 FROM orders WINDOW w1 AS (PARTITION BY o_custkey);
