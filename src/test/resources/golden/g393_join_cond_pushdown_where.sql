-- join_cond_pushdown_2.q: same predicates in WHERE — must equal g392
SELECT n_name, count(*) AS n, round(sum(s_acctbal) * 100) / 100 AS bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE s_acctbal > 1000 AND r_name <> 'EUROPE'
GROUP BY n_name
