-- reference: ql/src/test/queries/clientpositive/
-- alter_numbuckets_partitioned_table.q (+ the _h23/2 variants) —
-- ALTER TABLE ... CLUSTERED BY INTO N BUCKETS changes the bucket count
-- between inserts; each rewrite keeps content identical.
DROP TABLE IF EXISTS g1157_tst;
CREATE TABLE g1157_tst (key STRING, value STRING)
  PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) INTO 10 BUCKETS STORED AS PARQUET;
ALTER TABLE g1157_tst CLUSTERED BY (key) INTO 8 BUCKETS;
INSERT OVERWRITE TABLE g1157_tst PARTITION (ds='1')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
ALTER TABLE g1157_tst CLUSTERED BY (key) INTO 12 BUCKETS;
INSERT OVERWRITE TABLE g1157_tst PARTITION (ds='1')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
SELECT count(*) AS n, count(DISTINCT key) AS dk,
       sum(CAST(key AS INT)) AS sk
FROM g1157_tst WHERE ds='1'
