-- subquery_unqual_corr_expr.q: an EXPRESSION (not a bare column) on the
-- left of IN / NOT IN subqueries — lower(key) IN (...) and
-- concat(key,value) NOT IN (...). NOT IN keeps its three-valued
-- semantics: the subquery list here has no NULLs, so non-matches pass.
SELECT n_nationkey, n_name
FROM nation
WHERE lower(n_name) IN (SELECT lower(r_name) FROM region)
   OR concat(n_name, '_x') NOT IN (SELECT n_name FROM nation)
ORDER BY n_nationkey LIMIT 10
