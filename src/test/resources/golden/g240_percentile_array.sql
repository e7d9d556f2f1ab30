-- percentile with an ARRAY of fractions (GenericUDAFPercentile array form)
SELECT l_returnflag,
  percentile(CAST(l_quantity AS BIGINT), array(0.25, 0.5, 0.75)) AS q,
  round(percentile_approx(l_extendedprice, 0.5, 10000) * 100) / 100 AS m
FROM lineitem GROUP BY l_returnflag
