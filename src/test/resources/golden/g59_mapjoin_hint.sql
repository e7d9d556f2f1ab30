SELECT /*+ MAPJOIN(n) */ n.n_name, count(*) AS n_sup
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
