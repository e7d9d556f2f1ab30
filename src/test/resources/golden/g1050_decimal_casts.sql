-- reference: ql/src/test/queries/clientpositive/decimal_1.q + decimal_2.q
-- — the decimal cast battery: decimal(4,2) to every primitive target
-- (boolean via nonzero, integer family truncating, float/double/string,
-- timestamp as seconds-since-epoch) plus BD-literal columns.
DROP TABLE IF EXISTS g1050_dec;
CREATE TABLE g1050_dec (t DECIMAL(4,2), u DECIMAL(5), v DECIMAL(10,0)) USING parquet;
INSERT OVERWRITE TABLE g1050_dec
  SELECT cast('17.29' AS DECIMAL(4,2)), 3.1415926BD, 3115926.54321BD;
SELECT cast(t AS BOOLEAN) AS b, cast(t AS TINYINT) AS ti,
       cast(t AS SMALLINT) AS si, cast(t AS INT) AS i,
       cast(t AS BIGINT) AS bi, cast(t AS FLOAT) AS f,
       cast(t AS DOUBLE) AS d, cast(t AS STRING) AS s,
       cast(t AS TIMESTAMP) AS ts, u, v
FROM g1050_dec;
