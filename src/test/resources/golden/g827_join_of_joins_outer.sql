-- smb_mapjoin_25.q: LEFT OUTER JOIN between two JOIN subqueries, each
-- pinned to the same key, with the outer WHERE on the null-supplying
-- side (collapses to the single matching key).
SELECT t1.key AS k1, t2.key AS k2 FROM
  (SELECT a.n_nationkey AS key FROM nation a JOIN nation b
   ON (a.n_nationkey = b.n_nationkey) WHERE a.n_nationkey = 5) t1
LEFT OUTER JOIN
  (SELECT c.n_nationkey AS key FROM nation c JOIN nation d
   ON (c.n_nationkey = d.n_nationkey) WHERE c.n_nationkey = 5) t2
ON (t1.key = t2.key)
WHERE t2.key = 5
