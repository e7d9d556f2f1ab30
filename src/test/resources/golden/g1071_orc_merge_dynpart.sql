-- reference: ql/src/test/queries/clientpositive/orc_merge2.q — ORC
-- INSERT OVERWRITE through a mixed static/dynamic partition spec
-- (one='1', two, three) with hash-derived partition values; the
-- aggregate over the re-read table must match what was written.
SET hive.merge.orcfile.stripe.level=true;
SET hive.exec.dynamic.partition=true;
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1071_m;
CREATE TABLE g1071_m (key INT, value STRING)
  PARTITIONED BY (one STRING, two STRING, three STRING)
  STORED AS ORC;
INSERT OVERWRITE TABLE g1071_m PARTITION (one='1', two, three)
  SELECT CAST(l_orderkey AS INT), l_returnflag,
         pmod(hash(l_orderkey), 10) AS two,
         pmod(hash(l_returnflag), 10) AS three
  FROM lineitem WHERE l_orderkey < 200;
SELECT one, count(*) AS cnt, count(DISTINCT two) AS dtwo,
       count(DISTINCT three) AS dthree, sum(key) AS sk
FROM g1071_m GROUP BY one
