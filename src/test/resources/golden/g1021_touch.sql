-- touch.q: ALTER TABLE ... TOUCH at table and partition level — a
-- metadata-only timestamp poke that must not disturb data.
DROP TABLE IF EXISTS g1021_t;
CREATE TABLE g1021_t (key INT) USING parquet PARTITIONED BY (ds STRING);
INSERT INTO g1021_t PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey < 5;
ALTER TABLE g1021_t TOUCH;
ALTER TABLE g1021_t TOUCH PARTITION (ds='1');
SELECT key, ds FROM g1021_t ORDER BY key
