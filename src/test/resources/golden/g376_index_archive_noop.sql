-- Legacy index + archive statements (DDLSemanticAnalyzer.java:307,
-- 250-252): the features are deliberate skips (indexes dropped by Hive 3;
-- HAR archiving has no object-store analog) but the statements appear in
-- era scripts — accept + no-op, and the script's queries still run.
DROP TABLE IF EXISTS g376_t;
CREATE TABLE g376_t USING parquet AS
  SELECT n_nationkey, n_name, n_regionkey FROM nation;
CREATE INDEX g376_idx ON TABLE g376_t (n_name)
  AS 'org.apache.hadoop.hive.ql.index.compact.CompactIndexHandler'
  WITH DEFERRED REBUILD;
ALTER INDEX g376_idx ON g376_t REBUILD;
SHOW INDEXES ON g376_t;
ALTER TABLE g376_t ARCHIVE PARTITION (n_regionkey=1);
ALTER TABLE g376_t UNARCHIVE PARTITION (n_regionkey=1);
DROP INDEX g376_idx ON g376_t;
SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
FROM g376_t GROUP BY n_regionkey;
