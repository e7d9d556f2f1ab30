-- join0.q: cross join (JOIN with no ON) of two filtered+projected
-- subqueries — the full cartesian of the small filtered sets.
SELECT src1.n_nationkey AS k1, src1.n_name AS v1,
       src2.n_nationkey AS k2, src2.n_name AS v2
FROM (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5) src1
JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5) src2
