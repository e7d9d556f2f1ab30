SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey
              GROUP BY c.c_nationkey HAVING count(*) >= 5)
