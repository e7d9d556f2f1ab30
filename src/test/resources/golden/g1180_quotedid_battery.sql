-- reference: ql/src/test/queries/clientpositive/quotedid_partition.q +
-- quotedid_skew.q + quotedid_tblproperty.q — backquoted identifiers
-- with special characters as column names, partition keys, skew
-- columns, and in GROUP BY/filters.
DROP TABLE IF EXISTS g1180_q;
CREATE TABLE g1180_q (`x+1` STRING, `y&y` STRING)
  PARTITIONED BY (`!@#$%^&*()_q` STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1180_q PARTITION (`!@#$%^&*()_q`='a')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey < 5;
SELECT `x+1`, `y&y`, `!@#$%^&*()_q`
FROM g1180_q WHERE `!@#$%^&*()_q` = 'a' AND `x+1` = '3'
