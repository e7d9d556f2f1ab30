-- reference: ql/src/test/queries/clientpositive/stats0.q + stats4.q +
-- stats11.q — INSERT under hive.stats.autogather: table and partition
-- stats exist after the write (numRows in DESCRIBE FORMATTED), reads
-- unchanged.
DROP TABLE IF EXISTS g1064_np;
DROP TABLE IF EXISTS g1064_p;
set hive.stats.autogather=true;
CREATE TABLE g1064_np (key STRING, value STRING) USING parquet;
INSERT OVERWRITE TABLE g1064_np SELECT cast(n_nationkey AS STRING), n_name FROM nation;
CREATE TABLE g1064_p (key STRING, value STRING) USING parquet PARTITIONED BY (ds STRING);
INSERT OVERWRITE TABLE g1064_p PARTITION (ds='2008-04-08')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation;
set hive.stats.autogather=false;
DESCRIBE FORMATTED g1064_np;
SELECT 'np_rows' AS tag,
  (SELECT count(*) FROM g1064_np) AS n,
  (SELECT count(*) FROM g1064_p WHERE ds='2008-04-08') AS pn;
