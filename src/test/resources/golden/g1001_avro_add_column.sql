-- avro_add_column.q / avro_add_column2.q: ADD COLUMNS on a STORED AS
-- AVRO table — files written BEFORE the change lack the new column and
-- read NULL for it (avro schema resolution fills absent reader fields
-- with their null default), files written after carry real values.
DROP TABLE IF EXISTS g1001_doctors;
CREATE TABLE g1001_doctors (number INT, first_name STRING) STORED AS AVRO;
INSERT INTO g1001_doctors
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey < 3;
ALTER TABLE g1001_doctors ADD COLUMNS (last_name STRING);
INSERT INTO g1001_doctors
  SELECT CAST(n_nationkey AS INT), n_name, concat(n_name, '_L')
  FROM nation WHERE n_nationkey BETWEEN 3 AND 5;
SELECT number, first_name, last_name FROM g1001_doctors
