-- reference: ql/src/test/queries/clientpositive/push_or.q — an OR
-- between a partition-key predicate and a data-column predicate: rows
-- from the named partition plus matching rows from the other.
DROP TABLE IF EXISTS g1114_po;
CREATE TABLE g1114_po (key INT, value STRING)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1114_po PARTITION (ds='2000-04-08')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 20;
INSERT OVERWRITE TABLE g1114_po PARTITION (ds='2000-04-09')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 20;
SELECT key, value, ds FROM g1114_po
WHERE ds = '2000-04-09' OR key = 5
ORDER BY key, ds
