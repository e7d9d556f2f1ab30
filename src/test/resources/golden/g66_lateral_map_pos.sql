SELECT n_nationkey, k, v, p, x
FROM nation
LATERAL VIEW explode(map('a', n_nationkey, 'b', n_regionkey)) m AS k, v
LATERAL VIEW posexplode(array(10,20)) pe AS p, x
WHERE n_nationkey < 3
