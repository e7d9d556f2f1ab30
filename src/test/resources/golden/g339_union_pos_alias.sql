-- union_pos_alias.q: ORDER BY over a union by output-column POSITION and
-- by the first branch's alias.
SELECT r_regionkey AS rk, r_name AS nm FROM region WHERE r_regionkey < 2
UNION ALL
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey BETWEEN 10 AND 12
ORDER BY 1 DESC, nm;
