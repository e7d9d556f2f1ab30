-- vectorized_rcfile_columnar.q: explicit ColumnarSerDe +
-- RCFileInputFormat/RCFileOutputFormat class pair DDL, LIMIT'd insert,
-- ordered read-back (the reference pins the non-vector fallback; here it
-- pins the DDL-surface mapping and the columnar read path).
DROP TABLE IF EXISTS g685_columnTable;
CREATE TABLE g685_columnTable (key STRING, value STRING)
ROW FORMAT SERDE
  'org.apache.hadoop.hive.serde2.columnar.ColumnarSerDe'
STORED AS
  INPUTFORMAT 'org.apache.hadoop.hive.ql.io.RCFileInputFormat'
  OUTPUTFORMAT 'org.apache.hadoop.hive.ql.io.RCFileOutputFormat';
FROM nation
INSERT OVERWRITE TABLE g685_columnTable
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey)
  ORDER BY n_nationkey LIMIT 10;
SELECT key, value FROM g685_columnTable ORDER BY key
