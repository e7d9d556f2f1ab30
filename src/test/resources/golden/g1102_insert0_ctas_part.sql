-- reference: ql/src/test/queries/clientpositive/insert0.q — overwrite
-- then append under CBO, a CTAS with aggregate+limit, and a
-- dynamic-partition insert keyed on ceil(key/100).
set hive.cbo.enable=true;
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1102_ins;
DROP TABLE IF EXISTS g1102_ctas;
DROP TABLE IF EXISTS g1102_part;
CREATE TABLE g1102_ins (key INT, value STRING) USING parquet;
INSERT OVERWRITE TABLE g1102_ins
  SELECT CAST(l_orderkey AS INT), l_returnflag FROM lineitem
  ORDER BY 1 LIMIT 10;
INSERT INTO TABLE g1102_ins
  SELECT CAST(l_orderkey AS INT), l_returnflag FROM lineitem
  ORDER BY 1 DESC LIMIT 10;
CREATE TABLE g1102_ctas AS
  SELECT l_returnflag AS key, count(l_linestatus) AS foo
  FROM lineitem GROUP BY l_returnflag LIMIT 10;
CREATE TABLE g1102_part (key INT, value STRING)
  PARTITIONED BY (modkey BIGINT) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1102_part PARTITION (modkey)
  SELECT CAST(l_orderkey AS INT), l_returnflag, ceil(l_orderkey / 100)
  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_orderkey < 250;
SELECT (SELECT count(*) FROM g1102_ins) AS n_ins,
       (SELECT count(*) FROM g1102_ctas) AS n_ctas,
       (SELECT count(DISTINCT modkey) FROM g1102_part) AS n_parts,
       (SELECT sum(key) FROM g1102_part) AS sum_part
