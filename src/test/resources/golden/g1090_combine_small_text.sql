-- reference: ql/src/test/queries/clientpositive/combine1.q (+
-- combine2.q shape) — compressed text output sprayed across many
-- small files, re-read in one scan (the engine's split planner is
-- Spark's FileScan combine, the CombineHiveInputFormat analog).
set hive.exec.compress.output=true;
set mapred.output.compression.codec=org.apache.hadoop.io.compress.GzipCodec;
DROP TABLE IF EXISTS g1090_t;
CREATE TABLE g1090_t (key STRING, value STRING) STORED AS TEXTFILE;
INSERT OVERWRITE TABLE g1090_t
  SELECT CAST(l_orderkey AS STRING), l_returnflag
  FROM lineitem WHERE l_orderkey < 400 DISTRIBUTE BY l_orderkey % 8;
set hive.exec.compress.output=false;
SELECT count(*) AS n, count(DISTINCT key) AS dk,
       sum(CAST(key AS INT)) AS sk, min(value) AS mn, max(value) AS mx
FROM g1090_t
