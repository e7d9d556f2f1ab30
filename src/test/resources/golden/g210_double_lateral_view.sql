-- two parallel LATERAL VIEWs = cartesian of the two arrays per row
SELECT p_partkey, t1.w1, t2.w2
FROM part
LATERAL VIEW explode(split(p_type, ' ')) t1 AS w1
LATERAL VIEW explode(split(p_brand, '#')) t2 AS w2
WHERE p_partkey <= 10
