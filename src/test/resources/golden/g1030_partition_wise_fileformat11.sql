-- reference: ql/src/test/queries/clientpositive/
-- partition_wise_fileformat11.q — a PARTITIONED RCFILE table whose
-- schema then changes under the existing partition: key retyped
-- string->int (reads re-coerce the stored strings) and a column added
-- (existing rows read NULL for it). The reference pins that a binary
-- columnar serde tolerates both schema changes.
DROP TABLE IF EXISTS g1030_pt;
CREATE TABLE g1030_pt (key STRING, value STRING) PARTITIONED BY (dt STRING) STORED AS RCFILE;
INSERT OVERWRITE TABLE g1030_pt PARTITION (dt='1')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey = 21;
SELECT key + key AS kk, value FROM g1030_pt WHERE dt IS NOT NULL;
ALTER TABLE g1030_pt CHANGE key key INT;
SELECT key + key AS kk2, value FROM g1030_pt WHERE dt IS NOT NULL;
ALTER TABLE g1030_pt ADD COLUMNS (value2 STRING);
SELECT key, value, value2, dt FROM g1030_pt WHERE dt IS NOT NULL;
