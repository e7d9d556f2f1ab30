-- limit_pushdown.q: DISTINCT under an ordered limit.
SELECT DISTINCT(l_linenumber) AS dis FROM lineitem ORDER BY dis LIMIT 20;
