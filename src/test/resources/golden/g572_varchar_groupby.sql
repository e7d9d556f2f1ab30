-- varchar_2.q: aggregation over VARCHAR table columns must agree with the
-- same aggregation over plain STRING — sum of casted keys, counts, and
-- ORDER BY on the varchar value.
DROP TABLE IF EXISTS g572_s;
DROP TABLE IF EXISTS g572_v;
CREATE TABLE g572_s USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, concat('val_', n_regionkey) AS value FROM nation;
CREATE TABLE g572_v (key VARCHAR(10), value VARCHAR(20)) USING parquet;
INSERT INTO g572_v SELECT key, value FROM g572_s;
SELECT 'string' AS tag, CAST(value AS STRING) AS v, CAST(sum(CAST(key AS INT)) AS STRING) AS s, count(*) AS numrows
FROM g572_s GROUP BY value
UNION ALL
SELECT 'varchar', CAST(value AS STRING), CAST(sum(CAST(key AS INT)) AS STRING), count(*)
FROM g572_v GROUP BY value
