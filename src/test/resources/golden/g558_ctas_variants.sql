-- ctas.q: CTAS with column aliases + SORT BY + LIMIT, `CREATE TABLE IF
-- NOT EXISTS` as a no-op against an existing CTAS target, computed
-- columns (key/2, concat) with aliases, and a delimited-text CTAS.
DROP TABLE IF EXISTS g558_c1;
DROP TABLE IF EXISTS g558_c3;
DROP TABLE IF EXISTS g558_c4;
CREATE TABLE g558_c1 AS
  SELECT n_nationkey k, n_name value FROM nation SORT BY k, value LIMIT 10;
CREATE TABLE g558_c3 AS
  SELECT n_nationkey / 2 half_key, concat(n_name, '_con') conb
  FROM nation SORT BY half_key, conb LIMIT 10;
CREATE TABLE IF NOT EXISTS g558_c3 AS
  SELECT n_nationkey, n_name FROM nation SORT BY n_nationkey LIMIT 2;
CREATE TABLE g558_c4 ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
  STORED AS TEXTFILE AS
  SELECT n_nationkey key, n_name value FROM nation SORT BY key, value LIMIT 10;
SELECT 'c1' AS v, CAST(k AS STRING) AS a, value AS b FROM g558_c1
UNION ALL
SELECT 'c3', CAST(half_key AS STRING), conb FROM g558_c3
UNION ALL
SELECT 'c4', CAST(key AS STRING), value FROM g558_c4
