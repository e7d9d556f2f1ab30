-- orc_empty_strings.q: a column of all-empty strings, then a mix of
-- empty and non-empty, read back from ORC exactly (dictionary edge).
DROP TABLE IF EXISTS g991_eo;
CREATE TABLE g991_eo (key STRING) STORED AS ORC;
INSERT OVERWRITE TABLE g991_eo
  SELECT '' FROM nation WHERE n_nationkey < 10;
INSERT INTO g991_eo
  SELECT IF(n_nationkey % 3 = 0, CAST(n_nationkey AS STRING), '')
  FROM nation WHERE n_nationkey < 10;
SELECT key, length(key) AS len, count(*) AS cnt
FROM g991_eo GROUP BY key
