-- reference: ql/src/test/queries/clientpositive/union31.q — a FROM-first
-- multi-insert whose source is a UNION ALL: two group-by branches land
-- in different tables off one scan of the union.
DROP TABLE IF EXISTS g1123_t1;
DROP TABLE IF EXISTS g1123_t2;
DROP TABLE IF EXISTS g1123_t3;
DROP TABLE IF EXISTS g1123_t4;
CREATE TABLE g1123_t1 AS
  SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value
  FROM nation WHERE n_nationkey < 10;
CREATE TABLE g1123_t2 AS SELECT * FROM g1123_t1;
CREATE TABLE g1123_t3 (key STRING, cnt INT) USING parquet;
CREATE TABLE g1123_t4 (value STRING, cnt INT) USING parquet;
FROM (SELECT * FROM g1123_t1 UNION ALL SELECT * FROM g1123_t2) x
INSERT OVERWRITE TABLE g1123_t3 SELECT key, count(1) GROUP BY key
INSERT OVERWRITE TABLE g1123_t4 SELECT value, count(1) GROUP BY value;
SELECT (SELECT count(*) FROM g1123_t3) AS n3,
       (SELECT min(cnt) FROM g1123_t3) AS mn3,
       (SELECT count(*) FROM g1123_t4) AS n4,
       (SELECT max(cnt) FROM g1123_t4) AS mx4
