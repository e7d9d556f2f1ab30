-- constprog2.q shape: constant propagation through a join key equality,
-- including via a cast on the key
SELECT s1.n_nationkey, s1.n_nationkey + 1 AS k1, s2.n_name
FROM nation s1 JOIN nation s2 ON s1.n_nationkey = s2.n_nationkey AND s1.n_nationkey = 6
UNION ALL
SELECT s1.n_nationkey, s1.n_nationkey + 1, s2.n_name
FROM nation s1 JOIN nation s2 ON s1.n_nationkey = s2.n_nationkey AND cast(s1.n_nationkey AS double) = 7
