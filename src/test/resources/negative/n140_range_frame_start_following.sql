-- reference: ql/src/test/queries/clientnegative/ptf_window_boundaries2.q
-- a RANGE frame may not start at UNBOUNDED FOLLOWING
-- ERROR-CONTAINS: SPECIFIED_WINDOW_FRAME_INVALID_BOUND | UNBOUNDED FOLLOWING
SELECT sum(o_totalprice) OVER (ORDER BY o_orderkey RANGE UNBOUNDED FOLLOWING) FROM orders;
