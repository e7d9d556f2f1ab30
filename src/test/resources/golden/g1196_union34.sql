-- reference: ql/src/test/queries/clientpositive/union34.q — a 4-way
-- multi-insert spray off one sampled scan, then a UNION of a
-- (broadcastable) join result with two plain scans, under
-- auto-convert-join both on and off — identical rows both ways.
set hive.auto.convert.join=true;
DROP TABLE IF EXISTS g1196_1;
DROP TABLE IF EXISTS g1196_2;
DROP TABLE IF EXISTS g1196_3;
DROP TABLE IF EXISTS g1196_4;
CREATE TABLE g1196_1 (key STRING, value STRING) USING parquet;
CREATE TABLE g1196_2 (key STRING, value STRING) USING parquet;
CREATE TABLE g1196_3 (key STRING, value STRING) USING parquet;
CREATE TABLE g1196_4 (key STRING, value STRING) USING parquet;
FROM (SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value
      FROM nation TABLESAMPLE (10 ROWS)) a
INSERT OVERWRITE TABLE g1196_1 SELECT *
INSERT OVERWRITE TABLE g1196_2 SELECT *
INSERT OVERWRITE TABLE g1196_3 SELECT *
INSERT OVERWRITE TABLE g1196_4 SELECT *;
SELECT count(*) AS n, count(DISTINCT key) AS dk, min(value) AS mn FROM (
  SELECT sub1.key, sub1.value FROM
    (SELECT * FROM g1196_1) sub1
    JOIN (SELECT * FROM g1196_2) sub0 ON sub0.key = sub1.key
  UNION ALL
  SELECT key, value FROM g1196_3
  UNION ALL
  SELECT key, value FROM g1196_4
) alias0
