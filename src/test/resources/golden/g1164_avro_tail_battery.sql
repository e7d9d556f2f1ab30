-- reference: ql/src/test/queries/clientpositive/avro_sanity_test.q +
-- avro_native.q + avro_evolved_schemas.q + avro_schema_evolution_native.q
-- + avro_type_evolution.q + avro_add_column3.q +
-- avro_compression_enabled.q — STORED AS AVRO end to end: write, read,
-- ADD COLUMNS evolution over existing files, an int→long type widen
-- via CHANGE COLUMN, and a compressed write
-- (avro.output.codec=deflate).
set hive.exec.compress.output=true;
set avro.output.codec=deflate;
DROP TABLE IF EXISTS g1164_doctors;
CREATE TABLE g1164_doctors (number INT, first_name STRING) STORED AS AVRO;
INSERT INTO g1164_doctors
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 4;
ALTER TABLE g1164_doctors ADD COLUMNS (extra STRING);
INSERT INTO g1164_doctors
  SELECT CAST(n_nationkey AS INT), n_name, 'new'
  FROM nation WHERE n_nationkey BETWEEN 4 AND 6;
ALTER TABLE g1164_doctors CHANGE COLUMN number number BIGINT;
set hive.exec.compress.output=false;
SELECT number, first_name, extra FROM g1164_doctors
