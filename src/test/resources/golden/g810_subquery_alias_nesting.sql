-- subquery_alias.q: subqueries aliased with AS, nested three deep, each
-- level a bare SELECT * passthrough.
SELECT * FROM
  (SELECT * FROM
    (SELECT * FROM nation AS s WHERE s.n_nationkey < 7) AS src1
  ) AS src2
