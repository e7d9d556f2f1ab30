-- HAVING over an implicit global aggregate (no GROUP BY)
SELECT sum(s_acctbal) AS total, count(*) AS n
FROM supplier
HAVING count(*) > 0 AND sum(s_acctbal) > 100
