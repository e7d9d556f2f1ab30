-- reference: ql/src/test/queries/clientpositive/skewjoin_mapjoin1.q +
-- skewjoin_mapjoin2.q — hive.optimize.skewjoin together with a MAPJOIN
-- hint on a join whose left side is heavily skewed on one key; the
-- combination must not double- or drop-count the skewed key's rows.
DROP TABLE IF EXISTS g1054_skew;
CREATE TABLE g1054_skew (key INT, value STRING) USING parquet;
INSERT INTO g1054_skew
  SELECT CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE cast(l_orderkey % 100 AS INT) END,
         l_returnflag
  FROM lineitem WHERE l_orderkey < 2000;
set hive.optimize.skewjoin=true;
set hive.skewjoin.key=100;
SELECT /*+ MAPJOIN(n) */ count(*) AS cnt, count(DISTINCT s.key) AS dk
FROM g1054_skew s JOIN nation n ON s.key = n.n_nationkey;
