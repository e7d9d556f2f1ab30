-- reference: ql/src/test/queries/clientpositive/optional_outer.q — the
-- OUTER keyword is optional: LEFT/RIGHT/FULL JOIN must produce exactly
-- the rows of LEFT/RIGHT/FULL OUTER JOIN.
SELECT
  (SELECT count(*) FROM nation a LEFT OUTER JOIN region b
     ON a.n_regionkey = b.r_regionkey AND b.r_regionkey < 2) =
  (SELECT count(*) FROM nation a LEFT JOIN region b
     ON a.n_regionkey = b.r_regionkey AND b.r_regionkey < 2) AS left_same,
  (SELECT count(*) FROM nation a RIGHT OUTER JOIN region b
     ON a.n_regionkey = b.r_regionkey AND a.n_nationkey < 9) =
  (SELECT count(*) FROM nation a RIGHT JOIN region b
     ON a.n_regionkey = b.r_regionkey AND a.n_nationkey < 9) AS right_same,
  (SELECT count(*) FROM nation a FULL OUTER JOIN region b
     ON a.n_regionkey = b.r_regionkey) =
  (SELECT count(*) FROM nation a FULL JOIN region b
     ON a.n_regionkey = b.r_regionkey) AS full_same,
  (SELECT count(*) FROM nation a LEFT JOIN region b
     ON a.n_regionkey = b.r_regionkey AND b.r_regionkey < 2) AS left_rows
