-- union branch coercion across decimal scales and integer types
SELECT k, count(*) AS n FROM (
  SELECT CAST(o_orderkey AS DECIMAL(10,2)) AS k FROM orders WHERE o_orderkey <= 5
  UNION ALL
  SELECT CAST(o_orderkey AS DECIMAL(12,4)) AS k FROM orders WHERE o_orderkey <= 5
  UNION ALL
  SELECT CAST(o_orderkey AS INT) AS k FROM orders WHERE o_orderkey <= 5) u
GROUP BY k
