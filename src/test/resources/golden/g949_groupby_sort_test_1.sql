-- groupby_sort_test_1.q: GROUP BY on the CLUSTERED+SORTED key of a
-- bucketed table (2 buckets, re-inserted so multiple files exist) —
-- the map-side-sorted groupby shape; values must match a plain groupby.
DROP TABLE IF EXISTS g949_t1;
CREATE TABLE g949_t1 (key STRING, val STRING)
  USING parquet CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
INSERT OVERWRITE TABLE g949_t1
  SELECT CAST(n_regionkey AS STRING), concat('v', n_nationkey) FROM nation;
INSERT INTO g949_t1 SELECT key, val FROM g949_t1;
DROP TABLE IF EXISTS g949_out;
CREATE TABLE g949_out (key INT, cnt INT) USING parquet;
INSERT OVERWRITE TABLE g949_out
  SELECT key, count(1) FROM g949_t1 GROUP BY key;
SELECT g949_out.* FROM g949_out
