SELECT n_nationkey, pos, val
FROM nation
LATERAL VIEW posexplode(array(n_name, concat(n_name, '_x'))) t AS pos, val
WHERE n_nationkey < 4
