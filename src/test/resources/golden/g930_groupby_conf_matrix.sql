-- groupby conf matrix: the reference runs the same aggregations under
-- every combination of hive.map.aggr and hive.groupby.skewindata
-- (clientpositive/groupby1_map.q, groupby1_map_nomap.q,
-- groupby1_map_skew.q, groupby1_noskew.q, groupby2_map.q,
-- groupby2_map_skew.q, groupby2_noskew.q, groupby4_map.q,
-- groupby4_map_skew.q, groupby4_noskew.q, groupby5_map.q,
-- groupby5_map_skew.q, groupby5_noskew.q, groupby6_map.q,
-- groupby6_map_skew.q, groupby6_noskew.q) and expects IDENTICAL
-- results — the settings pick plans, never answers. The engine rides
-- Catalyst partial aggregation + AQE skew handling; the matrix is
-- materialized under each setting pair and the final probe asserts the
-- four results agree (diff count 0) while pinning the values once.
SET hive.map.aggr=true;
SET hive.groupby.skewindata=false;
DROP TABLE IF EXISTS g930_a;
CREATE TABLE g930_a USING parquet AS
SELECT n_regionkey AS k, sum(n_nationkey) AS s, count(DISTINCT n_name) AS d
FROM nation GROUP BY n_regionkey;
SET hive.map.aggr=false;
DROP TABLE IF EXISTS g930_b;
CREATE TABLE g930_b USING parquet AS
SELECT n_regionkey AS k, sum(n_nationkey) AS s, count(DISTINCT n_name) AS d
FROM nation GROUP BY n_regionkey;
SET hive.groupby.skewindata=true;
DROP TABLE IF EXISTS g930_c;
CREATE TABLE g930_c USING parquet AS
SELECT n_regionkey AS k, sum(n_nationkey) AS s, count(DISTINCT n_name) AS d
FROM nation GROUP BY n_regionkey;
SET hive.map.aggr=true;
DROP TABLE IF EXISTS g930_d;
CREATE TABLE g930_d USING parquet AS
SELECT n_regionkey AS k, sum(n_nationkey) AS s, count(DISTINCT n_name) AS d
FROM nation GROUP BY n_regionkey;
SET hive.groupby.skewindata=false;
SELECT a.k, a.s, a.d,
  (SELECT count(*) FROM (
     (SELECT * FROM g930_a EXCEPT SELECT * FROM g930_b)
     UNION ALL (SELECT * FROM g930_b EXCEPT SELECT * FROM g930_c)
     UNION ALL (SELECT * FROM g930_c EXCEPT SELECT * FROM g930_d)) x
  ) AS conf_diffs
FROM g930_a a ORDER BY a.k
