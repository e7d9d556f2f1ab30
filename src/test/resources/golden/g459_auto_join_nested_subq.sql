-- auto_join22.q: deep nesting — a join whose left side is a projected
-- subquery of another join, aggregated at the top.
SELECT round(sum(hash(src5_n_name)) * 1) AS checksum
FROM (
  SELECT n.n_name AS src5_n_name, n.n_nationkey AS src5_key
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
) src5
JOIN nation n4 ON src5.src5_key = n4.n_nationkey
