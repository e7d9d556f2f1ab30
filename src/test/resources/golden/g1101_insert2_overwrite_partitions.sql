-- reference: ql/src/test/queries/clientpositive/
-- insert2_overwrite_partitions.q — INSERT OVERWRITE of one partition
-- across DATABASES, run twice: the second overwrite replaces the
-- first, leaving exactly the top-5 rows.
CREATE DATABASE IF NOT EXISTS g1101_db1;
CREATE DATABASE IF NOT EXISTS g1101_db2;
DROP TABLE IF EXISTS g1101_db1.sourcetable;
DROP TABLE IF EXISTS g1101_db2.destintable;
CREATE TABLE g1101_db1.sourcetable (one STRING, two STRING)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT INTO g1101_db1.sourcetable PARTITION (ds='2011-11-11')
  SELECT n_name, CAST(n_nationkey AS STRING) FROM nation;
INSERT INTO g1101_db1.sourcetable PARTITION (ds='2011-11-11')
  SELECT n_name, CAST(n_nationkey + 100 AS STRING) FROM nation;
CREATE TABLE g1101_db2.destintable (one STRING, two STRING)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1101_db2.destintable PARTITION (ds='2011-11-11')
  SELECT one, two FROM g1101_db1.sourcetable WHERE ds='2011-11-11'
  ORDER BY one DESC, two DESC LIMIT 5;
INSERT OVERWRITE TABLE g1101_db2.destintable PARTITION (ds='2011-11-11')
  SELECT one, two FROM g1101_db1.sourcetable WHERE ds='2011-11-11'
  ORDER BY one DESC, two DESC LIMIT 5;
SELECT one, two FROM g1101_db2.destintable ORDER BY one DESC, two DESC
