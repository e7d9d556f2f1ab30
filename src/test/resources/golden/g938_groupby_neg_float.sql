-- groupby_neg_float.q: a NEGATIVE float (and its string spelling) as a
-- GROUP BY key — the unary minus inside a grouped constant used to
-- confuse Hive's key extraction; both forms group to one row.
SELECT cast('-30.33' AS DOUBLE) AS d
FROM nation GROUP BY cast('-30.33' AS DOUBLE) LIMIT 1;
DROP TABLE IF EXISTS g938_t;
CREATE TABLE g938_t USING parquet AS
SELECT '-30.33' AS s FROM nation GROUP BY '-30.33' LIMIT 1;
SELECT (SELECT cast('-30.33' AS DOUBLE) FROM nation
        GROUP BY cast('-30.33' AS DOUBLE) LIMIT 1) AS d,
       (SELECT s FROM g938_t) AS s
