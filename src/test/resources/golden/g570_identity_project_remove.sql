-- identity_project_remove_skip.q: identity projections wrapped around
-- SORT BY subqueries on both join legs, with constant equality filters
-- that must push through the identity layers into both scans.
DROP TABLE IF EXISTS g570_src;
CREATE TABLE g570_src USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, concat('val_', n_nationkey) AS value FROM nation;
SELECT t2.key AS k, t2.value AS v
FROM
  (SELECT key, value FROM (SELECT key, value FROM g570_src) t1 SORT BY key) t2
  JOIN
  (SELECT * FROM g570_src SORT BY key) t3
  ON (t2.key = t3.key)
WHERE t2.value = 'val_5' AND t3.key = '5'
