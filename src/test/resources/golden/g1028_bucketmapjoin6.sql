-- reference: ql/src/test/queries/clientpositive/bucketmapjoin6.q — two
-- co-bucketed co-sorted tables joined with a MAPJOIN hint, the result
-- inserted into a THIRD bucketed table (the join key stays the bucket
-- key end-to-end, so no extra shuffle is needed between join and write).
DROP TABLE IF EXISTS g1028_tmp1;
DROP TABLE IF EXISTS g1028_tmp2;
DROP TABLE IF EXISTS g1028_tmp3;
CREATE TABLE g1028_tmp1 (a STRING, b STRING) USING parquet CLUSTERED BY (a) SORTED BY (a) INTO 10 BUCKETS;
CREATE TABLE g1028_tmp2 (a STRING, b STRING) USING parquet CLUSTERED BY (a) SORTED BY (a) INTO 10 BUCKETS;
CREATE TABLE g1028_tmp3 (a STRING, b STRING, c STRING) USING parquet CLUSTERED BY (a) SORTED BY (a) INTO 10 BUCKETS;
INSERT OVERWRITE TABLE g1028_tmp1 SELECT cast(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey < 15;
INSERT OVERWRITE TABLE g1028_tmp2 SELECT cast(n_nationkey AS STRING), upper(n_name) FROM nation WHERE n_nationkey < 20;
INSERT OVERWRITE TABLE g1028_tmp3
  SELECT /*+ MAPJOIN(l) */ i.a, i.b, l.b
  FROM g1028_tmp1 i JOIN g1028_tmp2 l ON i.a = l.a;
SELECT * FROM g1028_tmp3;
