-- cte_2.q: CTEs feeding INSERT, CTAS, and a VIEW body — the golden reads
-- back through the view over the CTAS result.
DROP VIEW IF EXISTS g791_v1;
DROP TABLE IF EXISTS g791_s1;
DROP TABLE IF EXISTS g791_s2;
CREATE TABLE g791_s1 (key INT, value STRING) USING parquet;
WITH q1 AS (SELECT n_nationkey AS key, n_name AS value FROM nation WHERE n_nationkey = 5)
FROM q1
INSERT OVERWRITE TABLE g791_s1 SELECT *;
CREATE TABLE g791_s2 USING parquet AS
WITH q1 AS (SELECT n_nationkey AS key FROM nation WHERE n_nationkey = 4)
SELECT * FROM q1;
CREATE VIEW g791_v1 AS
WITH q1 AS (SELECT key, value FROM g791_s1)
SELECT * FROM q1;
SELECT v.key AS vkey, v.value AS vvalue, s.key AS skey
FROM g791_v1 v CROSS JOIN g791_s2 s
