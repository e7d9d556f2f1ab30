-- reference: ql/src/test/queries/clientnegative/load_wrong_noof_part.q —
-- LOAD DATA with a partition spec naming only ONE of two partition
-- keys refuses.
-- ERROR-CONTAINS: partition | spec | ds1 | not
DROP TABLE IF EXISTS neg371_loadpart1;
CREATE TABLE neg371_loadpart1 (a STRING, b STRING)
  PARTITIONED BY (ds STRING, ds1 STRING) STORED AS TEXTFILE;
LOAD DATA LOCAL INPATH '${NEGTMP}/nofile.txt'
  INTO TABLE neg371_loadpart1 PARTITION (ds='2009-05-05');
