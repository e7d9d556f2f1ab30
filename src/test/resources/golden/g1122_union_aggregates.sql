-- reference: ql/src/test/queries/clientpositive/union12.q + union20.q —
-- a 3-way UNION ALL of per-branch aggregates landed in a table, and a
-- JOIN of two union subqueries on the union-produced key.
DROP TABLE IF EXISTS g1122_tmp;
CREATE TABLE g1122_tmp (key STRING, value BIGINT) USING parquet;
INSERT OVERWRITE TABLE g1122_tmp
  SELECT u.key, u.value FROM (
    SELECT 'tst1' AS key, count(1) AS value FROM nation
    UNION ALL
    SELECT 'tst2', count(1) FROM region
    UNION ALL
    SELECT 'tst3', count(1) FROM part) u;
SELECT 'landed' AS tag, x.key AS k1, CAST(x.value AS STRING) AS v1,
       CAST(NULL AS STRING) AS k2, CAST(NULL AS STRING) AS v2
FROM g1122_tmp x
UNION ALL
SELECT 'joined', u1.key, u1.value, u2.key, u2.value FROM
  (SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value FROM nation
   UNION ALL
   SELECT CAST(n_nationkey AS STRING), n_name FROM nation
   WHERE n_nationkey < 3) u1
JOIN
  (SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value FROM nation
   UNION ALL
   SELECT CAST(n_nationkey AS STRING), n_name FROM nation
   WHERE n_nationkey < 3) u2
ON u1.key = u2.key
