-- reference: ql/src/test/queries/clientnegative/truncate_table_failure3.q
-- — TRUNCATE of an EXTERNAL table refuses: truncate only serves
-- managed tables.
-- ERROR-CONTAINS: external | EXTERNAL
DROP TABLE IF EXISTS neg353_ext;
CREATE EXTERNAL TABLE neg353_ext (a INT, b INT)
  PARTITIONED BY (ds STRING) STORED AS PARQUET
  LOCATION '${NEGTMP}/neg353_ext';
TRUNCATE TABLE neg353_ext;
