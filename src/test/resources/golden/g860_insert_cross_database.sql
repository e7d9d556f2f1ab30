-- insert1.q: INSERT targets across DATABASES — a FROM-first multi-insert
-- writing one branch into a table of ANOTHER database, plus a
-- db-qualified read back from a third.
CREATE DATABASE IF NOT EXISTS g860_x;
DROP TABLE IF EXISTS g860_ins1;
DROP TABLE IF EXISTS g860_x.g860_ins1;
CREATE TABLE g860_ins1 (key INT, value STRING) USING parquet;
CREATE TABLE g860_x.g860_ins1 (key INT, value STRING) USING parquet;
FROM nation
INSERT INTO TABLE g860_ins1 SELECT n_nationkey, n_name WHERE n_nationkey < 10
INSERT OVERWRITE TABLE g860_x.g860_ins1
  SELECT n_nationkey, n_name WHERE n_nationkey > 10 AND n_nationkey < 20;
SELECT 'local' AS tag, key, value FROM g860_ins1
UNION ALL
SELECT 'other', key, value FROM g860_x.g860_ins1
