-- subquery_notin.q: correlated NOT IN over a windowed derived table
SELECT p_brand, b.p_name, p_size FROM part b
WHERE b.p_name NOT IN (
  SELECT p_name FROM (
    SELECT p_brand, p_name, p_size, rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS r FROM part) a
  WHERE r <= 2 AND b.p_brand = a.p_brand)
