-- join on a COALESCE-derived key
SELECT count(*) AS n FROM
  (SELECT coalesce(nullif(o_orderstatus, 'P'), 'X') AS k FROM orders) a
JOIN
  (SELECT coalesce(nullif(o_orderstatus, 'F'), 'X') AS k FROM orders WHERE o_orderkey <= 100) b
ON a.k = b.k
