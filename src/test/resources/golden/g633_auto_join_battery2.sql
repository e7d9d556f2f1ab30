-- auto_join10.q, auto_join11.q, auto_join12.q, auto_join14.q,
-- auto_join15.q, auto_join16.q, auto_join17.q, auto_join18.q,
-- auto_join19.q, auto_join20.q: auto-converted joins over subqueries —
-- re-aliased inner queries (aj10/11/12), grouped-then-joined (aj14/17),
-- and the three-table mixed outer chain (aj19/20).
SELECT 'subq_realias' AS tag, COUNT(*) AS n, SUM(x.c1) AS s FROM
  (SELECT n_nationkey AS c1 FROM nation WHERE n_nationkey < 20) x
  JOIN (SELECT n_nationkey AS c2 FROM nation WHERE n_nationkey < 15) y
  ON x.c1 = y.c2
UNION ALL
SELECT 'grouped_then_join', COUNT(*), SUM(g.cnt) FROM
  (SELECT n_regionkey, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey) g
  JOIN region r ON g.n_regionkey = r.r_regionkey
UNION ALL
SELECT 'mixed_outer_chain', COUNT(*), SUM(COALESCE(c.n_nationkey, -1)) FROM
  nation a JOIN region b ON a.n_regionkey = b.r_regionkey
  LEFT OUTER JOIN nation c
    ON a.n_nationkey = c.n_nationkey AND c.n_nationkey < 10
