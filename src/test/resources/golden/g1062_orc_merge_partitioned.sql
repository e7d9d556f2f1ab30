-- reference: ql/src/test/queries/clientpositive/orc_merge2.q +
-- orc_merge5.q + orc_merge6.q — many small ORC files per (dynamic)
-- partition, CONCATENATE per partition, counts and sums unchanged by
-- the merge.
DROP TABLE IF EXISTS g1062_orc;
CREATE TABLE g1062_orc (userid BIGINT, string1 STRING, subtype DOUBLE)
  PARTITIONED BY (ds STRING) STORED AS ORC;
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
INSERT OVERWRITE TABLE g1062_orc PARTITION (ds)
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         cast(o_orderkey % 2 AS STRING) AS ds
  FROM orders WHERE o_orderkey < 600 DISTRIBUTE BY o_orderkey;
ALTER TABLE g1062_orc PARTITION (ds='0') CONCATENATE;
ALTER TABLE g1062_orc PARTITION (ds='1') CONCATENATE;
SELECT ds, count(*) AS n, sum(userid) AS su, round(sum(subtype) * 100) / 100 AS ss
FROM g1062_orc GROUP BY ds;
