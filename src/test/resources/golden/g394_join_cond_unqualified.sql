-- join_cond_pushdown_unqual1.q: unqualified column names resolved across a
-- 3-way join (each column name is unique to one input)
SELECT o_orderstatus, count(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey AND o_totalprice > 100000
JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
WHERE l_linenumber = 1
GROUP BY o_orderstatus
