-- alter3.q: RENAME of a PARTITIONED table (with ':' in partition
-- values, the stem's escaping probe) — partitions and data survive the
-- rename and a LIKE-clone loads the same layout.
DROP TABLE IF EXISTS g873_renamed;
DROP TABLE IF EXISTS g873_t;
DROP TABLE IF EXISTS g873_like;
CREATE TABLE g873_t (col1 STRING)
  USING parquet PARTITIONED BY (pcol1 STRING, pcol2 STRING);
INSERT OVERWRITE TABLE g873_t PARTITION (pcol1='test_part:', pcol2='test_part:')
  SELECT n_name FROM nation WHERE n_nationkey < 3;
ALTER TABLE g873_t RENAME TO g873_renamed;
CREATE TABLE g873_like LIKE g873_renamed;
INSERT OVERWRITE TABLE g873_like PARTITION (pcol1='test_part:', pcol2='test_part:')
  SELECT col1 FROM g873_renamed WHERE pcol1 = 'test_part:';
SELECT r.col1 AS a, l.col1 AS b, r.pcol1, r.pcol2
FROM g873_renamed r JOIN g873_like l ON r.col1 = l.col1
WHERE r.pcol1 = 'test_part:' AND r.pcol2 = 'test_part:'
