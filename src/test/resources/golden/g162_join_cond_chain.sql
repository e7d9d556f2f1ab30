-- join_cond_pushdown_1.q shape 1: chained equi-conds over a 3-way self join
SELECT count(*) AS n, sum(p1.p_size) AS s
FROM part p1 JOIN part p2 JOIN part p3
ON p1.p_name = p2.p_name AND p2.p_name = p3.p_name
