-- reference: ql/src/test/queries/clientpositive/create_escape.q — a
-- DELIMITED text table with ESCAPED BY '\\': a value containing the
-- field delimiter (tab) and backslashes round-trips byte-exact.
DROP TABLE IF EXISTS g1087_t;
CREATE TABLE g1087_t (a STRING, b STRING)
ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t' ESCAPED BY '\\'
STORED AS TEXTFILE;
INSERT OVERWRITE TABLE g1087_t
  SELECT CAST(n_nationkey AS STRING), concat('\\', '\t', '\\')
  FROM nation WHERE n_nationkey = 3;
SELECT a, b, length(b) AS blen FROM g1087_t
