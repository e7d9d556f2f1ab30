-- reference: ql/src/test/queries/clientnegative/ptf_window_boundaries2.q
-- (frame-validation family): a value-bounded RANGE frame requires
-- exactly one ORDER BY expression
-- ERROR-CONTAINS: RANGE_FRAME_MULTI_ORDER | more than one order by
SELECT sum(o_totalprice) OVER (ORDER BY o_orderkey, o_custkey
  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) FROM orders;
