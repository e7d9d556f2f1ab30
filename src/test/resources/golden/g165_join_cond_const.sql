-- join_cond_pushdown_1.q shape 4: constant-only cond on one table
SELECT count(*) AS n, min(p1.p_partkey) AS k1 FROM part p1 JOIN part p2 JOIN part p3
ON p2.p_partkey = 1 AND p3.p_name = p2.p_name
