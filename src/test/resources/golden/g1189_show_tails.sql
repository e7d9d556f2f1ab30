-- reference: ql/src/test/queries/clientpositive/show_partitions.q +
-- showparts.q + show_tableproperties1.q + show_describe_func_quotes.q
-- + show_columns1.q — SHOW PARTITIONS with and without a filter spec,
-- SHOW TBLPROPERTIES by key, and DESCRIBE FUNCTION with quoted names.
DROP TABLE IF EXISTS g1189_p;
CREATE TABLE g1189_p (key INT)
  PARTITIONED BY (ds STRING, hr STRING) STORED AS PARQUET
  TBLPROPERTIES ('tprop'='tvalue');
ALTER TABLE g1189_p ADD PARTITION (ds='2008-04-08', hr='11');
ALTER TABLE g1189_p ADD PARTITION (ds='2008-04-08', hr='12');
ALTER TABLE g1189_p ADD PARTITION (ds='2008-04-09', hr='11');
SHOW PARTITIONS g1189_p;
SHOW PARTITIONS g1189_p PARTITION (ds='2008-04-08')
