-- reference: ql/src/test/queries/clientnegative/ptf_window_boundaries.q
-- (window argument-validation family): ntile with zero buckets
-- ERROR-CONTAINS: VALUE_OUT_OF_RANGE | buckets
SELECT ntile(0) OVER (ORDER BY n_nationkey) FROM nation;
