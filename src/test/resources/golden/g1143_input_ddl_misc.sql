-- reference: ql/src/test/queries/clientpositive/input10.q + input15.q —
-- DESCRIBE of a freshly created partitioned TEXTFILE table (partition
-- keys listed after the data columns with the partition-information
-- section) and of a delimited table.
DROP TABLE IF EXISTS g1143_test10;
DROP TABLE IF EXISTS g1143_test15;
CREATE TABLE g1143_test10 (key INT, value STRING)
  PARTITIONED BY (ds STRING, hr STRING) STORED AS TEXTFILE;
CREATE TABLE g1143_test15 (key INT, value STRING)
  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t' STORED AS TEXTFILE;
DESCRIBE g1143_test10;
DESCRIBE g1143_test15
