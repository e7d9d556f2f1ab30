-- orc_ends_with_nulls.q: a column whose value run ends in a long NULL
-- tail (present-stream boundary) reads back with the nulls intact.
DROP TABLE IF EXISTS g992_en;
CREATE TABLE g992_en (key STRING) STORED AS ORC;
INSERT OVERWRITE TABLE g992_en
  SELECT IF(n_nationkey = 0, '1', CAST(NULL AS STRING))
  FROM nation ORDER BY n_nationkey;
SELECT (key IS NULL) AS is_null, count(*) AS cnt
FROM g992_en GROUP BY (key IS NULL)
