-- alter_char2.q: CHANGE COLUMN char narrowing on a PARTITIONED table —
-- the read view truncates across existing and later-written partitions
-- alike (the stored bytes never change).
DROP TABLE IF EXISTS g934_ac2;
CREATE TABLE g934_ac2 (c1 CHAR(255)) USING parquet PARTITIONED BY (hr INT);
INSERT OVERWRITE TABLE g934_ac2 PARTITION (hr=1)
  SELECT n_name FROM nation WHERE n_nationkey = 3;
ALTER TABLE g934_ac2 CHANGE COLUMN c1 c1 CHAR(10);
INSERT OVERWRITE TABLE g934_ac2 PARTITION (hr=2)
  SELECT concat(n_name, ' padded well beyond ten characters')
  FROM nation WHERE n_nationkey = 3;
SELECT hr, c1, length(c1) AS len FROM g934_ac2 ORDER BY hr
