-- reference: ql/src/test/queries/clientnegative/ptf_window_boundaries.q
-- a frame may not START at UNBOUNDED FOLLOWING
-- ERROR-CONTAINS: SPECIFIED_WINDOW_FRAME_INVALID_BOUND | UNBOUNDED FOLLOWING
SELECT sum(o_totalprice) OVER (ROWS UNBOUNDED FOLLOWING) FROM orders;
