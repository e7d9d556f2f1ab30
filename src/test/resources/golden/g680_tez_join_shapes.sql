-- tez_join_tests.q, tez_joins_explain.q, filter_join_breaktask2.q: the
-- engine-specific plan files' underlying QUERY shapes — a left outer
-- whose probe is itself a join, and a filter sandwiched between two
-- joins (breaktask2).
SELECT 'outer_of_join' AS tag, COUNT(*) AS n FROM
  (SELECT n.n_nationkey, n.n_regionkey FROM nation n
     JOIN region r ON n.n_regionkey = r.r_regionkey) j
  RIGHT OUTER JOIN nation m ON j.n_nationkey = m.n_nationkey
UNION ALL
SELECT 'breaktask2', COUNT(*) FROM
  (SELECT * FROM nation WHERE n_nationkey <> 11) a
  JOIN region r1 ON a.n_regionkey = r1.r_regionkey
  JOIN (SELECT * FROM region WHERE r_name <> 'ASIA') r2 ON a.n_regionkey = r2.r_regionkey
