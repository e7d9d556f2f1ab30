-- ppd_join2.q / join_cond_pushdown shape: a constant predicate on one
-- join key must transit to the other two tables in a 3-way equi-join.
SELECT c.c_custkey AS ck, o.o_orderkey AS ok, n.n_name AS nname
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey < 20 AND o.o_orderstatus = 'O'
