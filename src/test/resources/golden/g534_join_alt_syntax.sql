-- join_alt_syntax.q: comma-separated FROM lists with join predicates in
-- WHERE, a subquery in the comma list, and the mixed form `t1 , t2 JOIN t3
-- ON ... JOIN t4` where the comma legs' conditions live in WHERE — all
-- must plan as equi-joins over the same result set.
SELECT 'three_way' AS v, p1.p_partkey AS k
FROM part p1, part p2, part p3
WHERE p1.p_name = p2.p_name AND p2.p_name = p3.p_name AND p1.p_partkey <= 20
UNION ALL
SELECT 'subquery_leg', p1.p_partkey
FROM part p1, (SELECT p_name FROM part) p2, part p3
WHERE p1.p_name = p2.p_name AND p2.p_name = p3.p_name AND p1.p_partkey <= 20
UNION ALL
SELECT 'mixed_comma_join', p1.p_partkey
FROM part p1, part p2 JOIN part p3 ON p2.p_name = p1.p_name JOIN part p4
WHERE p2.p_name = p3.p_name AND p1.p_partkey = p4.p_partkey
  AND p1.p_partkey = p2.p_partkey AND p1.p_partkey <= 20
UNION ALL
SELECT 'join_then_comma', p1.p_partkey
FROM part p1 JOIN part p2 ON p2.p_name = p1.p_name, part p3, part p4
WHERE p2.p_name = p3.p_name AND p1.p_partkey = p4.p_partkey
  AND p1.p_partkey = p2.p_partkey AND p1.p_partkey <= 20
