-- reference: ql/src/test/queries/clientnegative/
-- show_tablestatus_not_existing_part.q — SHOW TABLE EXTENDED with a
-- partition spec that does not exist refuses.
-- ERROR-CONTAINS: not found | cannot be found | does not exist
DROP TABLE IF EXISTS neg351_srcpart;
CREATE TABLE neg351_srcpart (key STRING)
  PARTITIONED BY (ds STRING, hr STRING) STORED AS PARQUET;
ALTER TABLE neg351_srcpart ADD PARTITION (ds='2008-04-08', hr='11');
SHOW TABLE EXTENDED LIKE `neg351_srcpart` PARTITION (ds='2008-14-08', hr='11');
