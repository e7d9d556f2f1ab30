-- join_filters_overlap.q (HIVE-3411): chained outer joins whose ON clauses
-- carry overlapping single-alias constant filters
DROP TABLE IF EXISTS g373_a;
CREATE TABLE g373_a AS SELECT 100 AS key, v AS value FROM (SELECT explode(array(40, 50, 60)) AS v) t;
SELECT a.key AS ak, a.value AS av, b.value AS bv, c.value AS cv, 'lll' AS tag
FROM g373_a a LEFT OUTER JOIN g373_a b ON (a.key=b.key AND a.value=50 AND b.value=50)
LEFT OUTER JOIN g373_a c ON (a.key=c.key AND a.value=60 AND c.value=60)
UNION ALL
SELECT a.key, a.value, b.value, c.value, 'rll'
FROM g373_a a RIGHT OUTER JOIN g373_a b ON (a.key=b.key AND a.value=50 AND b.value=50)
LEFT OUTER JOIN g373_a c ON (b.key=c.key AND b.value=60 AND c.value=60)
UNION ALL
SELECT a.key, a.value, b.value, c.value, 'fll'
FROM g373_a a FULL OUTER JOIN g373_a b ON (a.key=b.key AND a.value=50 AND b.value=50)
LEFT OUTER JOIN g373_a c ON (b.key=c.key AND b.value=60 AND c.value=60)
