SELECT n_name, c1, c2
FROM nation
LATERAL VIEW explode(array(array(1,2),array(3))) t1 AS a1
LATERAL VIEW explode(a1) t2 AS c1
LATERAL VIEW explode(array('x','y')) t3 AS c2
WHERE n_nationkey < 3
