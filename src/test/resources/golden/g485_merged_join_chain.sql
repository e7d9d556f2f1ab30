-- mergejoins.q: four-way chain all on the SAME key — Hive merges them
-- into one join stage; rows are the contract.
SELECT a.n_nationkey AS k, a.n_name AS n1, b.n_name AS n2,
       c.n_name AS n3, d.n_name AS n4
FROM nation a
JOIN nation b ON a.n_nationkey = b.n_nationkey
JOIN nation c ON b.n_nationkey = c.n_nationkey
JOIN nation d ON c.n_nationkey = d.n_nationkey
WHERE a.n_nationkey < 6
