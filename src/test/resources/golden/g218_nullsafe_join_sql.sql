-- join_nullsafe.q: <=> join over NULL-bearing keys (SQL text form)
SELECT count(*) AS n_eq, sum(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS null_matches FROM
  (SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderkey % 7 END AS k FROM orders) a
JOIN
  (SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey % 7 END AS k FROM orders WHERE o_orderkey <= 300) b
ON a.k <=> b.k
