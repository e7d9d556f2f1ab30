-- join_cond_pushdown_1.q shape 2: conds written right-to-left
SELECT count(*) AS n FROM part p1 JOIN part p2 JOIN part p3
ON p2.p_name = p1.p_name AND p3.p_name = p2.p_name
