-- approx_count_distinct pinned against the exact NDV with its 3x-rsd
-- bound (udaf_ndv.q / compute_stats family): the boolean column is the
-- contract — an HLL regression outside the requested error surfaces as
-- a golden diff, while the estimate itself stays engine-internal.
-- reference: ql/src/test/queries/clientpositive/udaf_ndv.q
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_nd,
       abs(approx_count_distinct(l_partkey, 0.02) - count(DISTINCT l_partkey))
         <= count(DISTINCT l_partkey) * 0.06 AS within_bound
FROM lineitem GROUP BY l_returnflag;
