-- OR in the join condition: no equi-key, exercises the non-hashable path
SELECT n.n_nationkey, r.r_regionkey
FROM nation n JOIN region r
  ON n.n_regionkey = r.r_regionkey OR n.n_nationkey = r.r_regionkey
WHERE n.n_nationkey < 6
