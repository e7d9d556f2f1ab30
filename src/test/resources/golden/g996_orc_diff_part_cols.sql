-- orc_diff_part_cols.q: ADD COLUMNS between partition writes — the
-- early partition's files lack the new column and read NULL for it,
-- the later partition carries real values (per-partition ORC schema
-- evolution).
DROP TABLE IF EXISTS g996_t;
CREATE TABLE g996_t (key STRING)
  STORED AS ORC PARTITIONED BY (part STRING);
INSERT OVERWRITE TABLE g996_t PARTITION (part='1')
  SELECT CAST(n_nationkey AS STRING) FROM nation
  WHERE n_nationkey < 5;
ALTER TABLE g996_t ADD COLUMNS (cnt INT);
INSERT OVERWRITE TABLE g996_t PARTITION (part='2')
  SELECT CAST(n_regionkey AS STRING) AS key, CAST(count(*) AS INT) AS cnt
  FROM nation GROUP BY n_regionkey;
SELECT key, cnt, part FROM g996_t
