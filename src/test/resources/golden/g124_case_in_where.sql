SELECT n_name, n_regionkey FROM nation
WHERE CASE WHEN n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')
           THEN n_nationkey < 20 ELSE n_nationkey < 5 END
