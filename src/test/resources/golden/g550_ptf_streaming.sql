-- ptf_streaming.q: windowing over the `noopstreaming` PTF (the streaming
-- no-op table function) — rank / dense_rank / running sum must compute
-- identically to windowing over the bare table, with the PTF's PARTITION
-- BY / ORDER BY clause absorbed as a reshuffle.
SELECT p_brand, p_name, p_size,
  rank() OVER (PARTITION BY p_brand ORDER BY p_name) AS r,
  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_name) AS dr,
  sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
FROM noopstreaming(ON part
  PARTITION BY p_brand
  ORDER BY p_name)
WHERE p_partkey <= 40
