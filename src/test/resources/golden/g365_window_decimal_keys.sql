-- ptf_decimal.q shapes: navigation and ranking windows partitioned and
-- ordered by DECIMAL columns (incl. DESC decimal order)
SELECT ks, rp,
  lead(rp) OVER (PARTITION BY ks ORDER BY nm) AS c1,
  lag(rp) OVER (PARTITION BY ks ORDER BY nm) AS c2,
  first_value(rp) OVER (PARTITION BY ks ORDER BY nm) AS c3,
  last_value(rp) OVER (PARTITION BY ks ORDER BY nm) AS c4,
  rank() OVER (PARTITION BY ks ORDER BY rp) AS r,
  round(percent_rank() OVER (PARTITION BY ks ORDER BY rp) * 1000) / 1000 AS pr,
  ntile(3) OVER (PARTITION BY ks ORDER BY rp) AS nt,
  lag(rp) OVER (PARTITION BY ks ORDER BY rp DESC) AS ld
FROM (SELECT p_brand AS ks, p_name AS nm,
             cast(p_retailprice AS decimal(12,2)) AS rp
      FROM part WHERE p_partkey <= 60) t
