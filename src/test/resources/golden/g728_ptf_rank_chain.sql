-- clientpositive/ptf.q: rank + dense_rank + a running sum over the same
-- window specification, chained with lag.
SELECT p_brand, p_name, p_size,
  rank() OVER (PARTITION BY p_brand ORDER BY p_name) AS r,
  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_name) AS dr,
  p_size - lag(p_size, 1, p_size) OVER (PARTITION BY p_brand ORDER BY p_name) AS deltaSz
FROM part
WHERE p_partkey < 60;
