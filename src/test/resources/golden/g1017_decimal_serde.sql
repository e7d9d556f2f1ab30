-- decimal_serde.q: decimal values through the TEXT serde and back
-- through ORC — grouped counts over the decimal key equal across
-- storage (text round-trips the decimal rendering).
DROP TABLE IF EXISTS g1017_txt;
DROP TABLE IF EXISTS g1017_orc;
CREATE TABLE g1017_txt (key DECIMAL(20,10), value INT)
  ROW FORMAT DELIMITED FIELDS TERMINATED BY ',' STORED AS TEXTFILE;
INSERT INTO g1017_txt VALUES
  (CAST('-4400' AS DECIMAL(20,10)), 4400),
  (CAST('3.14' AS DECIMAL(20,10)), 3),
  (CAST('3.14' AS DECIMAL(20,10)), 4),
  (CAST('0.01' AS DECIMAL(20,10)), 0),
  (NULL, 0);
CREATE TABLE g1017_orc STORED AS ORC AS SELECT * FROM g1017_txt;
SELECT 'txt' AS probe, key, count(*) AS cnt FROM g1017_txt GROUP BY key
UNION ALL
SELECT 'orc' AS probe, key, count(*) AS cnt FROM g1017_orc GROUP BY key
