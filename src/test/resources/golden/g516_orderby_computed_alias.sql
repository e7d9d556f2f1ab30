-- order by a computed select alias plus a function of a non-selected
-- column (legal in HiveQL).
SELECT n_name AS name, n_nationkey * 2 AS dbl
FROM nation
WHERE n_nationkey < 12
ORDER BY dbl % 5, n_regionkey + 1, name
LIMIT 8
