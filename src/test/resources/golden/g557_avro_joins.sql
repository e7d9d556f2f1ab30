-- avro_joins.q / avro_joins_native.q: two STORED AS AVRO tables joined on
-- a key — the avro read path must feed the join like any native source,
-- including a column pruned to just the join key + one payload per side.
DROP TABLE IF EXISTS g557_doctors;
DROP TABLE IF EXISTS g557_episodes;
CREATE TABLE g557_doctors (number INT, first_name STRING, last_name STRING)
  STORED AS AVRO;
CREATE TABLE g557_episodes (title STRING, air_date STRING, doctor INT)
  STORED AS AVRO;
INSERT INTO g557_doctors
  SELECT CAST(n_nationkey AS INT), concat('fn_', n_name), concat('ln_', n_name)
  FROM nation WHERE n_nationkey < 6;
INSERT INTO g557_episodes
  SELECT concat('ep_', n_nationkey), concat('1970-01-0', 1 + n_nationkey % 9),
         CAST(n_nationkey % 6 AS INT)
  FROM nation WHERE n_nationkey < 12;
SELECT e.title, e.air_date, d.first_name, d.last_name
FROM g557_episodes e JOIN g557_doctors d ON e.doctor = d.number
