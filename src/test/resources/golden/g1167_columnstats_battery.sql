-- reference: ql/src/test/queries/clientpositive/columnstats_partlvl.q +
-- columnstats_partlvl_dp.q + columnstats_tbllvl.q + colstats_all_nulls.q
-- — ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS at table and
-- partition level, including a column that is entirely NULL; reads
-- after stats collection stay exact.
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1167_emp;
DROP TABLE IF EXISTS g1167_nulls;
CREATE TABLE g1167_emp (name STRING, salary DOUBLE)
  PARTITIONED BY (country STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1167_emp PARTITION (country)
  SELECT n_name, CAST(n_nationkey * 1000 AS DOUBLE), concat('c', n_regionkey)
  FROM nation;
ANALYZE TABLE g1167_emp PARTITION (country='c1') COMPUTE STATISTICS FOR COLUMNS name, salary;
ANALYZE TABLE g1167_emp COMPUTE STATISTICS FOR COLUMNS;
CREATE TABLE g1167_nulls USING parquet AS
  SELECT CAST(NULL AS DOUBLE) AS all_null, n_nationkey AS k FROM nation;
ANALYZE TABLE g1167_nulls COMPUTE STATISTICS FOR COLUMNS;
SELECT (SELECT count(*) FROM g1167_emp) AS n_emp,
       (SELECT count(DISTINCT country) FROM g1167_emp) AS n_countries,
       (SELECT count(all_null) FROM g1167_nulls) AS nn,
       (SELECT sum(salary) FROM g1167_emp WHERE country = 'c1') AS s_c1
