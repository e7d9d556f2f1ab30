-- Legacy index statements (DDLSemanticAnalyzer.java:307): the feature
-- is a deliberate skip (indexes dropped by Hive 3) but the statements
-- appear in era scripts — accept + no-op, and the script's queries still
-- run. (ARCHIVE left this golden in round 13: it has real semantics now
-- — operators/Archive.scala, g707/g708.)
DROP TABLE IF EXISTS g376_t;
CREATE TABLE g376_t USING parquet AS
  SELECT n_nationkey, n_name, n_regionkey FROM nation;
CREATE INDEX g376_idx ON TABLE g376_t (n_name)
  AS 'org.apache.hadoop.hive.ql.index.compact.CompactIndexHandler'
  WITH DEFERRED REBUILD;
ALTER INDEX g376_idx ON g376_t REBUILD;
SHOW INDEXES ON g376_t;
DROP INDEX g376_idx ON g376_t;
SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
FROM g376_t GROUP BY n_regionkey;
