-- WHERE on the outer side's column: the classic outer-to-inner conversion
SELECT count(*) AS kept FROM customer c
LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_totalprice > 100000;
SELECT count(*) AS kept_null FROM customer c
LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey IS NULL
