-- insert_into2.q: INSERT INTO a STATIC partition twice (appends must
-- accumulate — snapshotted into g575_s), then INSERT OVERWRITE the same
-- partition (resets it), leaving a sibling partition untouched
-- throughout.
DROP TABLE IF EXISTS g575_t;
DROP TABLE IF EXISTS g575_s;
CREATE TABLE g575_t (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO TABLE g575_t PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation LIMIT 100;
INSERT INTO TABLE g575_t PARTITION (ds='2')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 5;
INSERT INTO TABLE g575_t PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation LIMIT 100;
CREATE TABLE g575_s USING parquet AS
  SELECT ds, count(*) AS n FROM g575_t GROUP BY ds;
INSERT OVERWRITE TABLE g575_t PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 3;
SELECT 'after_appends' AS v, ds, CAST(n AS STRING) AS n FROM g575_s
UNION ALL
SELECT 'after_overwrite', ds, CAST(count(*) AS STRING) FROM g575_t GROUP BY ds
