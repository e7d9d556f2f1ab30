-- join_cond_pushdown_1.q shape 3: arithmetic cond collapses to p2 key = 0
SELECT count(*) AS n FROM part p1 JOIN part p2 JOIN part p3
ON p2.p_partkey + p1.p_partkey = p1.p_partkey AND p3.p_name = p2.p_name
