-- subquery_multiinsert.q: FROM-first multi-insert whose branches carry
-- IN / NOT IN subquery predicates (each branch re-filters the one shared
-- scan through a subquery).
DROP TABLE IF EXISTS g329_a;
DROP TABLE IF EXISTS g329_b;
CREATE TABLE g329_a (name STRING) USING parquet;
CREATE TABLE g329_b (name STRING) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g329_a
  SELECT n_name WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
INSERT OVERWRITE TABLE g329_b
  SELECT n_name WHERE n_nationkey NOT IN (SELECT r_regionkey FROM region) AND n_nationkey < 8;
SELECT 'a' AS src, name FROM g329_a
UNION ALL
SELECT 'b' AS src, name FROM g329_b
ORDER BY src, name;
