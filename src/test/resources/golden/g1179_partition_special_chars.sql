-- reference: ql/src/test/queries/clientpositive/partition_special_char.q
-- + partition_decode_name.q — partition values containing ':', '%',
-- and spaces: the directory name escapes, SHOW PARTITIONS decodes, and
-- filtered reads resolve the escaped paths.
DROP TABLE IF EXISTS g1179_sc;
CREATE TABLE g1179_sc (key INT)
  PARTITIONED BY (ts STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1179_sc PARTITION (ts='2011-01-11+15:18:26')
  SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey < 4;
INSERT OVERWRITE TABLE g1179_sc PARTITION (ts='100%')
  SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey < 2;
INSERT OVERWRITE TABLE g1179_sc PARTITION (ts='a b')
  SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey < 3;
SELECT
  (SELECT count(*) FROM g1179_sc WHERE ts = '2011-01-11+15:18:26') AS colons,
  (SELECT count(*) FROM g1179_sc WHERE ts = '100%') AS percent,
  (SELECT count(*) FROM g1179_sc WHERE ts = 'a b') AS space,
  (SELECT count(DISTINCT ts) FROM g1179_sc) AS nparts
