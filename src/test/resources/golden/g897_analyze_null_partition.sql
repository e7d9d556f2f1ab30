-- analyze_table_null_partition.q: a dynamic-partition insert with NULL
-- partition values lands in __HIVE_DEFAULT_PARTITION__, reads back as
-- NULL, and ANALYZE over the partitioned table still succeeds.
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g897_t1;
DROP TABLE IF EXISTS g897_t2;
CREATE TABLE g897_t1 (name STRING, age INT) USING parquet;
INSERT INTO g897_t1 VALUES ('a', 10), ('b', NULL), ('c', 10), ('d', 20);
CREATE TABLE g897_t2 (name STRING) USING parquet PARTITIONED BY (age INT);
FROM g897_t1 INSERT OVERWRITE TABLE g897_t2 PARTITION (age)
  SELECT g897_t1.name, g897_t1.age;
ANALYZE TABLE g897_t2 PARTITION(age) COMPUTE STATISTICS;
SELECT age, count(*) AS n, min(name) AS mn
FROM g897_t2 GROUP BY age ORDER BY age NULLS FIRST
