-- vectorized_ptf.q: windowing over join output — rank/sum frames per
-- partition key, the vectorized PTF battery shape.
SELECT rk, k, rnk, run_sum FROM (
  SELECT a.n_regionkey AS rk, a.n_nationkey AS k,
    RANK() OVER (PARTITION BY a.n_regionkey ORDER BY a.n_nationkey) AS rnk,
    SUM(a.n_nationkey) OVER (PARTITION BY a.n_regionkey ORDER BY a.n_nationkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum
  FROM nation a JOIN region b ON a.n_regionkey = b.r_regionkey) w
WHERE rnk <= 3
