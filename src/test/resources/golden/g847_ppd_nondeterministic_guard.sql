-- ppd_random.q: a NON-DETERMINISTIC predicate (rand()) must not push
-- below the join — pinned deterministically by making the rand branch
-- unreachable (rand() >= 0 is always true, OR short-circuits) while
-- keeping the nondeterministic call in the WHERE.
SELECT src1.c1, src2.c4
FROM (SELECT n_nationkey AS c1, n_name AS c2 FROM nation) src1
JOIN (SELECT n_nationkey AS c3, n_regionkey AS c4 FROM nation
      WHERE n_nationkey > 2) src2
ON src1.c1 = src2.c3
WHERE rand() >= 0 AND src1.c1 < 10
