-- alter4.q: ALTER TABLE ... NOT CLUSTERED drops the bucketing spec (in
-- the default and a non-default database); the table keeps reading.
DROP DATABASE IF EXISTS g935_db CASCADE;
DROP TABLE IF EXISTS g935_bkt;
CREATE TABLE g935_bkt (key INT, value STRING) USING parquet
  CLUSTERED BY (key) INTO 10 BUCKETS;
INSERT INTO g935_bkt VALUES (1, 'a'), (2, 'b');
ALTER TABLE g935_bkt NOT CLUSTERED;
CREATE DATABASE g935_db;
CREATE TABLE g935_db.bkt2 (key INT) USING parquet
  CLUSTERED BY (key) INTO 4 BUCKETS;
ALTER TABLE g935_db.bkt2 NOT CLUSTERED;
SELECT key, value FROM g935_bkt ORDER BY key
