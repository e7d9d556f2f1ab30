-- reference: ql/src/test/queries/clientpositive/decimal_3.q (decimal
-- group/order/distinct battery over decimal(38,18)) + decimal_udf.q +
-- decimal_udf2.q (arithmetic between decimal and int columns —
-- key+key, key+value, key*value, key/2 with the Hive result scales).
DROP TABLE IF EXISTS g1051_dec3;
CREATE TABLE g1051_dec3 (key DECIMAL(38,18), value INT) USING parquet;
INSERT INTO g1051_dec3 VALUES
  (-4400.0, 4400), (1E-9, 0), (0.3, 0), (0.33, 0), (0.333, 0),
  (1.0, 1), (2.0, 2), (3.14, 3), (-1.12, -1), (1.122, 1),
  (124.00, 124), (125.2, 125), (NULL, 0), (3.14, 4);
SELECT 'dist' AS tag, cast(key AS STRING) AS k, NULL AS s FROM (SELECT DISTINCT key FROM g1051_dec3) d
UNION ALL
SELECT 'grp', cast(key AS STRING), cast(sum(value) AS STRING) FROM g1051_dec3 GROUP BY key
UNION ALL
SELECT 'arith', cast(key + key AS STRING),
       cast(round(key * cast(value AS DECIMAL(10,2)), 6) AS STRING)
FROM g1051_dec3 WHERE value BETWEEN 1 AND 4;
