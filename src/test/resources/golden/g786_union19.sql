-- union19.q: FROM-first MULTI-INSERT over a union of an aggregate
-- branch and a table branch — one sink aggregates the union, the other
-- projects it raw (value duplicated into two columns).
DROP TABLE IF EXISTS g786_d1;
DROP TABLE IF EXISTS g786_d2;
CREATE TABLE g786_d1 (key STRING, value BIGINT);
CREATE TABLE g786_d2 (key STRING, val1 STRING, val2 STRING);
FROM (SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value FROM nation s1
      UNION ALL
      SELECT s2.n_name AS key, CAST(s2.n_nationkey AS STRING) AS value FROM nation s2) unionsrc
INSERT OVERWRITE TABLE g786_d1 SELECT unionsrc.key, count(unionsrc.value) GROUP BY unionsrc.key
INSERT OVERWRITE TABLE g786_d2 SELECT unionsrc.key, unionsrc.value, unionsrc.value;
SELECT 'd1' AS src, key, CAST(value AS STRING) AS v1, NULL AS v2 FROM g786_d1
UNION ALL
SELECT 'd2' AS src, key, val1, val2 FROM g786_d2
