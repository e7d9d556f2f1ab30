SELECT n.n_nationkey,
       on_side.s_suppkey  AS on_supp,
       where_side.s_suppkey AS where_supp
FROM nation n
LEFT JOIN supplier on_side
  ON n.n_nationkey = on_side.s_nationkey AND on_side.s_acctbal > 3000
LEFT JOIN supplier where_side
  ON n.n_nationkey = where_side.s_nationkey
WHERE where_side.s_acctbal > 3000 OR where_side.s_suppkey IS NULL
