-- auto_join33.q: join whose keys are EXPRESSIONS over filtered
-- subqueries (a.key+1 = b.key+2), both sides of the same table.
SELECT a.n_nationkey, a.n_name, b.n_nationkey AS bk, b.n_name AS bn FROM
  (SELECT * FROM nation WHERE n_nationkey + 1 < 10) a
JOIN
  (SELECT * FROM nation WHERE n_nationkey + 2 < 10) b
ON a.n_nationkey + 1 = b.n_nationkey + 2
