-- semijoin4.q/leftsemijoin.q family: LEFT SEMI with OR-key predicate via
-- IN, correlated EXISTS, and semi after aggregation.
SELECT 'in_agg' AS tag, COUNT(*) AS n FROM nation
WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')
UNION ALL
SELECT 'exists_corr', COUNT(*) FROM region r
WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20)
UNION ALL
SELECT 'semi_after_gby', COUNT(*) FROM (
  SELECT n_regionkey, COUNT(*) AS c FROM nation GROUP BY n_regionkey) g
WHERE g.n_regionkey IN (SELECT r_regionkey FROM region)
