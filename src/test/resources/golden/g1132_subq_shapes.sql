-- reference: ql/src/test/queries/clientpositive/subq.q + noalias_subq1.q
-- — FROM-first subquery projections, and filtering a derived table by
-- a column the outer select does not project.
SELECT 'noalias' AS tag, c1 FROM
  (SELECT n_name AS c1, n_nationkey AS c2 FROM nation) x
WHERE c2 < 5
UNION ALL
SELECT 'fromfirst', u.n_name FROM
  (FROM nation SELECT nation.* WHERE nation.n_nationkey < 3) u
