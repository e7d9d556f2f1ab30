-- cluster.q shape: the literal CLUSTER BY text form (= DISTRIBUTE BY +
-- SORT BY on the same keys), plus the || concat operator (HIVE-15254)
SELECT n_regionkey, n_nationkey, n_name || '/' || cast(n_regionkey AS string) AS tag
FROM nation
CLUSTER BY n_regionkey, n_nationkey
