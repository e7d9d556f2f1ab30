-- join_cond_pushdown_3.q: mixed equi + non-equi conditions in one ON — the
-- equi pair drives the hash join, the rest become join filters
SELECT count(*) AS n
FROM orders JOIN customer
  ON o_custkey = c_custkey AND c_acctbal * 2 > o_totalprice
