-- reference: ql/src/test/queries/clientpositive/orc_analyze.q —
-- ANALYZE TABLE COMPUTE STATISTICS on an ORC table: full scan,
-- NOSCAN, a partitioned variant, and a read after each proving
-- content is untouched.
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1201_people;
CREATE TABLE g1201_people (id INT, first_name STRING, salary DECIMAL(10,2))
  PARTITIONED BY (state STRING) STORED AS ORC;
INSERT OVERWRITE TABLE g1201_people PARTITION (state)
  SELECT CAST(n_nationkey AS INT), n_name,
         CAST(n_nationkey * 10 AS DECIMAL(10,2)), concat('s', n_regionkey)
  FROM nation;
ANALYZE TABLE g1201_people PARTITION (state) COMPUTE STATISTICS;
ANALYZE TABLE g1201_people PARTITION (state='s1') COMPUTE STATISTICS NOSCAN;
SELECT (SELECT count(*) FROM g1201_people) AS n,
       (SELECT sum(salary) FROM g1201_people WHERE state = 's1') AS s1_sal
