-- reference: ql/src/test/queries/clientpositive/union17.q + union21.q +
-- union_date_trim.q + unionDistinct_1.q — a union feeding a
-- multi-insert with DISTINCT aggregates per branch, a 4-way union of
-- constants/udf-outputs/columns, UNION DISTINCT chains, and a
-- date-vs-trimmed-string union branch reconciliation.
DROP TABLE IF EXISTS g1184_d1;
DROP TABLE IF EXISTS g1184_d2;
DROP TABLE IF EXISTS g1184_dt;
CREATE TABLE g1184_d1 (key STRING, cnt BIGINT) USING parquet;
CREATE TABLE g1184_d2 (key STRING, value STRING, cnt BIGINT) USING parquet;
FROM (SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value FROM nation
      UNION ALL
      SELECT CAST(n_nationkey AS STRING), n_name FROM nation) unionsrc
INSERT OVERWRITE TABLE g1184_d1
  SELECT unionsrc.key, count(DISTINCT substr(unionsrc.value, 5)) GROUP BY unionsrc.key
INSERT OVERWRITE TABLE g1184_d2
  SELECT unionsrc.key, unionsrc.value, count(DISTINCT substr(unionsrc.value, 5))
  GROUP BY unionsrc.key, unionsrc.value;
CREATE TABLE g1184_dt (id INT, dt DATE) USING parquet;
INSERT INTO g1184_dt VALUES (1, DATE '2014-04-07'), (2, DATE '2014-04-08'),
                            (3, DATE '2014-04-09');
INSERT INTO g1184_dt
  SELECT id, CAST(tm AS DATE) FROM (
    SELECT id, CAST(dt AS STRING) AS tm FROM g1184_dt WHERE id = 1
    UNION ALL
    SELECT id, trim(CAST(dt AS STRING)) AS tm FROM g1184_dt WHERE id = 3) a;
SELECT
  (SELECT count(*) FROM g1184_d1) AS n1,
  (SELECT count(*) FROM g1184_d2) AS n2,
  (SELECT count(*) FROM (
     SELECT DISTINCT key FROM (
       SELECT '1' AS key FROM nation
       UNION DISTINCT
       SELECT reverse(n_name) FROM nation
       UNION DISTINCT
       SELECT CAST(n_nationkey AS STRING) FROM nation) u) x) AS n_dist,
  (SELECT count(*) FROM g1184_dt) AS n_dt
