-- groupby7_map.q: map-side-aggregation toggles (Hive set statements,
-- accepted as conf) with one scan multi-inserted into two group-bys over
-- different keys.
set hive.map.aggr=true;
set hive.groupby.skewindata=false;
DROP TABLE IF EXISTS g452_o1;
DROP TABLE IF EXISTS g452_o2;
CREATE TABLE g452_o1 (key INT, s DOUBLE);
CREATE TABLE g452_o2 (key INT, s DOUBLE);
FROM orders
INSERT OVERWRITE TABLE g452_o1
  SELECT cast(o_custkey % 10 AS INT), round(sum(o_totalprice) * 100) / 100 GROUP BY o_custkey % 10
INSERT OVERWRITE TABLE g452_o2
  SELECT cast(o_orderkey % 7 AS INT), round(sum(o_totalprice) * 100) / 100 GROUP BY o_orderkey % 7;
SELECT 'o1' AS src, key, s FROM g452_o1
UNION ALL
SELECT 'o2', key, s FROM g452_o2
