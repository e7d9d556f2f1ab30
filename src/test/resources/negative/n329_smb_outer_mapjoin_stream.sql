-- reference: ql/src/test/queries/clientnegative/smb_bucketmapjoin.q —
-- /*+ MAPJOIN(a) */ on `a LEFT OUTER JOIN b` refuses: hashing a means
-- streaming b, but b is the null-extending side, so the streamed table
-- choice is invalid (Error 10246). Hinting b instead is legal.
-- ERROR-CONTAINS: 10246 | streaming is not valid
DROP TABLE IF EXISTS neg_smb4_1;
DROP TABLE IF EXISTS neg_smb4_2;
CREATE TABLE neg_smb4_1 (key INT, value STRING)
  CLUSTERED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE neg_smb4_2 (key INT, value STRING)
  CLUSTERED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
INSERT OVERWRITE TABLE neg_smb4_1
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
INSERT OVERWRITE TABLE neg_smb4_2
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
set hive.optimize.bucketmapjoin=true;
set hive.optimize.bucketmapjoin.sortedmerge=true;
SELECT /*+ MAPJOIN(a) */ *
FROM neg_smb4_1 a LEFT OUTER JOIN neg_smb4_2 b ON a.key = b.key;
