-- ALTER INDEX ... SET IDXPROPERTIES (DDLSemanticAnalyzer.java:395
-- TOK_ALTERINDEX_PROPERTIES): the index feature is a deliberate skip, but
-- the statement must not kill a legacy script — accept + no-op alongside
-- the rest of the index statement family.
DROP TABLE IF EXISTS g523_t;
CREATE TABLE g523_t USING parquet AS
  SELECT n_nationkey, n_name FROM nation;
CREATE INDEX g523_idx ON TABLE g523_t (n_name)
  AS 'org.apache.hadoop.hive.ql.index.compact.CompactIndexHandler'
  WITH DEFERRED REBUILD;
ALTER INDEX g523_idx ON g523_t SET IDXPROPERTIES ('creator'='graft', 'note'='noop');
ALTER INDEX g523_idx ON g523_t REBUILD;
DROP INDEX g523_idx ON g523_t;
SELECT count(*) AS n FROM g523_t;
