-- avro_decimal_native.q: DECIMAL columns through the native STORED AS
-- AVRO surface — two precisions (5,2 and narrowing from 8,4), insert from
-- a parquet staging table, read back with rounding at the narrower scale.
DROP TABLE IF EXISTS g556_dec;
DROP TABLE IF EXISTS g556_avro_dec;
CREATE TABLE g556_dec (name STRING, value DECIMAL(8,4)) USING parquet;
INSERT INTO g556_dec VALUES
  ('a', 1234.5678), ('b', 0.1000), ('c', -77.25), ('d', 999.9999);
CREATE TABLE g556_avro_dec (name STRING, value DECIMAL(6,2))
  STORED AS AVRO;
INSERT OVERWRITE TABLE g556_avro_dec SELECT name, value FROM g556_dec;
SELECT name, CAST(value AS STRING) AS v FROM g556_avro_dec
