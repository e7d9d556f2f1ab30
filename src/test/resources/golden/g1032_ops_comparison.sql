-- reference: ql/src/test/queries/clientpositive/ops_comparison.q — the
-- comparison battery incl. 'NaN' strings coerced to double: NaN orders
-- GREATER than every number (java Double.compare), and NaN <> NaN under
-- both < and > (reference .q.out: 'NaN'<2.0 false, 1.0<'NaN' true,
-- 1.0>'NaN' false, 'NaN'>2.0 true, 'NaN'>'NaN' false, 'NaN'<'NaN' false).
SELECT
  1.0 < 2.0   AS lt_tt,
  2.0 < 2.0   AS lt_eq,
  2.0 > 1.0   AS gt_tt,
  2.0 > 2.0   AS gt_eq,
  'NaN' < 2.0 AS nan_lt_num,
  1.0 < 'NaN' AS num_lt_nan,
  1.0 > 'NaN' AS num_gt_nan,
  'NaN' > 2.0 AS nan_gt_num,
  'NaN' > 'NaN' AS nan_gt_nan,
  'NaN' < 'NaN' AS nan_lt_nan
FROM nation LIMIT 1;
