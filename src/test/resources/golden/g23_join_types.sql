SELECT n.n_name, count(s.s_suppkey) AS n_sup
FROM nation n LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
