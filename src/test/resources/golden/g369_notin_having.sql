-- subquery_notin_having.q shapes: NOT IN subquery inside HAVING, over a
-- grouped key (non-correlated) and with the pair-distinct count variant
SELECT b.p_brand, min(p_retailprice) AS mn
FROM part b
GROUP BY b.p_brand
HAVING b.p_brand NOT IN (SELECT p_brand FROM part WHERE p_size > 45)
UNION ALL
SELECT l_returnflag, cast(count(DISTINCT l_partkey, l_suppkey) AS decimal(12,2))
FROM lineitem
GROUP BY l_returnflag
HAVING l_returnflag NOT IN (SELECT l_linestatus FROM lineitem WHERE l_quantity > 49)
