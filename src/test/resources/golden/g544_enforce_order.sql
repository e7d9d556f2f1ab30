-- enforce_order.q: CREATE TABLE ... CLUSTERED BY (key) SORTED BY (key ASC
-- / key DESC) INTO 1 BUCKETS, INSERT OVERWRITE from a plain table — the
-- enforced sort order must round-trip (hive.enforce.sorting semantics:
-- the writer sorts each bucket file on the declared keys).
DROP TABLE IF EXISTS g544_asc;
DROP TABLE IF EXISTS g544_desc;
CREATE TABLE g544_asc (key STRING, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key ASC) INTO 1 BUCKETS;
CREATE TABLE g544_desc (key STRING, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key DESC) INTO 1 BUCKETS;
INSERT OVERWRITE TABLE g544_asc
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey) FROM nation;
INSERT OVERWRITE TABLE g544_desc
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey) FROM nation;
SELECT 'asc' AS v, key, value FROM g544_asc WHERE key < '2'
UNION ALL
SELECT 'desc', key, value FROM g544_desc WHERE key < '2'
