-- avro_change_schema.q / avro_type_evolution family: widening the
-- declared column type over existing avro files — int-written data
-- read back through a BIGINT catalog column (avro int→long promotion)
-- and a renamed-via-CHANGE column keeps its values.
DROP TABLE IF EXISTS g1002_av;
CREATE TABLE g1002_av (id INT, name STRING) STORED AS AVRO;
INSERT INTO g1002_av
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey < 4;
ALTER TABLE g1002_av CHANGE COLUMN id id BIGINT;
SELECT id, (id + 10000000000) AS widened, name FROM g1002_av
