-- reference: ql/src/test/queries/clientpositive/char_2.q — group/sum/
-- count over CHAR(10)/CHAR(20) columns must match the same query over
-- the string source (char padding is not significant in grouping).
DROP TABLE IF EXISTS g1081_src;
DROP TABLE IF EXISTS g1081_char;
CREATE TABLE g1081_src USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, substr(n_name, 1, 1) AS value
  FROM nation;
CREATE TABLE g1081_char (key CHAR(10), value CHAR(20));
INSERT OVERWRITE TABLE g1081_char SELECT * FROM g1081_src;
SELECT s.value, s.sum_key, s.numrows,
       c.sum_key AS char_sum, c.numrows AS char_rows
FROM (SELECT value, sum(CAST(key AS INT)) AS sum_key, count(*) AS numrows
      FROM g1081_src GROUP BY value) s
JOIN (SELECT value, sum(CAST(key AS INT)) AS sum_key, count(*) AS numrows
      FROM g1081_char GROUP BY value) c
  ON s.value = c.value
