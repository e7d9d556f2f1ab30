-- avro_create/avro_insert shape: CREATE TABLE ... STORED AS AVRO maps to
-- the from-scratch avro source (sources/v2/AvroDataSource — no spark-avro
-- jar in the environment); insert and read back round-trip.
DROP TABLE IF EXISTS g505_t;
CREATE TABLE g505_t (k INT, name STRING, amt DOUBLE) STORED AS AVRO;
INSERT INTO g505_t SELECT n_nationkey, n_name, n_nationkey * 1.5 FROM nation WHERE n_nationkey < 6;
SELECT k, name, round(amt * 100) / 100 AS amt FROM g505_t
