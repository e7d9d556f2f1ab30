-- ppd_clusterby.q: predicate pushdown under CLUSTER BY, single-table
-- and across a self-join clustering on a SELECT alias.
SELECT x.n_nationkey AS key, x.n_name AS v1, y.n_nationkey AS ykey
FROM nation x JOIN nation y ON (x.n_nationkey = y.n_nationkey)
WHERE x.n_nationkey = 20 CLUSTER BY v1
