WITH t AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal, c_custkey
           FROM customer WHERE c_custkey <= 30)
SELECT 'nf' AS mode, c_custkey FROM (SELECT c_custkey FROM t ORDER BY bal ASC NULLS FIRST, c_custkey LIMIT 5) x
UNION ALL
SELECT 'nl' AS mode, c_custkey FROM (SELECT c_custkey FROM t ORDER BY bal ASC NULLS LAST, c_custkey LIMIT 5) y
