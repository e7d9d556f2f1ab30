-- char_serde.q: char(15)/char(20) columns through DIFFERENT storage
-- serdes — Hive text (LazySimpleSerDe) and ORC — read the same
-- stripped values and order identically.
DROP TABLE IF EXISTS g1014_ls;
DROP TABLE IF EXISTS g1014_orc;
CREATE TABLE g1014_ls (key CHAR(15), value CHAR(20))
  ROW FORMAT DELIMITED FIELDS TERMINATED BY ',' STORED AS TEXTFILE;
INSERT OVERWRITE TABLE g1014_ls
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation
  WHERE n_nationkey < 6;
CREATE TABLE g1014_orc (key CHAR(15), value CHAR(20)) STORED AS ORC;
INSERT OVERWRITE TABLE g1014_orc SELECT key, value FROM g1014_ls;
SELECT 'text' AS probe, key, length(key) AS klen, value
  FROM g1014_ls
UNION ALL
SELECT 'orc' AS probe, key, length(key) AS klen, value
  FROM g1014_orc
