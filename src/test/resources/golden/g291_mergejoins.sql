-- mergejoins.q: N-way join over the SAME equi-key (the reference merges
-- these into one join stage; semantics must stay identical regardless).
SELECT a.n_nationkey, a.n_name, b.n_name AS b_name, c.n_name AS c_name,
       r.r_name
FROM nation a
JOIN nation b ON a.n_nationkey = b.n_nationkey
JOIN nation c ON b.n_nationkey = c.n_nationkey
JOIN region r ON a.n_regionkey = r.r_regionkey
WHERE a.n_nationkey < 6
ORDER BY a.n_nationkey;
