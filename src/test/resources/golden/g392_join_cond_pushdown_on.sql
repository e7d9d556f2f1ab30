-- join_cond_pushdown_1.q: single-table predicates written in ON clauses of
-- INNER joins push to the scans; result equals the WHERE form (g393)
SELECT n_name, count(*) AS n, round(sum(s_acctbal) * 100) / 100 AS bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND s_acctbal > 1000
JOIN region ON n_regionkey = r_regionkey AND r_name <> 'EUROPE'
GROUP BY n_name
