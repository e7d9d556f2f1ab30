-- reference: ql/src/test/queries/clientnegative/desc_failure2.q —
-- DESCRIBE of a partition spec that does not exist refuses.
-- ERROR-CONTAINS: not found | cannot be found | does not exist
DROP TABLE IF EXISTS neg339_srcpart;
CREATE TABLE neg339_srcpart (key STRING)
  PARTITIONED BY (ds STRING, hr STRING) STORED AS PARQUET;
ALTER TABLE neg339_srcpart ADD PARTITION (ds='2012-04-08', hr='11');
DESC neg339_srcpart PARTITION (ds='2012-04-08', hr='15');
