-- reference: ql/src/test/queries/clientnegative/ptf_negative_InvalidValueBoundary.q
-- a value-bounded RANGE frame over a non-numeric ORDER BY key
-- ERROR-CONTAINS: SPECIFIED_WINDOW_FRAME_UNACCEPTED_TYPE | data type mismatch
SELECT sum(o_totalprice) OVER (ORDER BY o_orderstatus
  RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) FROM orders;
