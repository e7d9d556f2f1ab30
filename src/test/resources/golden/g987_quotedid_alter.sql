-- quotedid_alter.q: backticked identifiers with special characters
-- survive ALTER surfaces — a partition COLUMN named `!@#$%^&*()_q`
-- through dynamic insert, ADD PARTITION IF NOT EXISTS, and partition
-- RENAME.
DROP TABLE IF EXISTS g987_p3;
CREATE TABLE g987_p3 (`x+1` STRING, `y&y` STRING)
  USING parquet PARTITIONED BY (`q_q` STRING);
INSERT OVERWRITE TABLE g987_p3 PARTITION (`q_q`='a')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation
  WHERE n_nationkey < 3;
ALTER TABLE g987_p3 ADD IF NOT EXISTS PARTITION (`q_q`='b');
ALTER TABLE g987_p3 PARTITION (`q_q`='b') RENAME TO PARTITION (`q_q`='c');
SELECT `x+1` AS x1, `y&y` AS yy, `q_q` AS p FROM g987_p3 ORDER BY x1
