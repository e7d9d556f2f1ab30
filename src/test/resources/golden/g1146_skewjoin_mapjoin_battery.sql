-- reference: ql/src/test/queries/clientpositive/skewjoin_mapjoin3.q +
-- skewjoin_mapjoin4.q + skewjoin_mapjoin5.q + skewjoin_mapjoin6.q +
-- skewjoin_mapjoin7.q + skewjoin_mapjoin8.q + skewjoin_mapjoin9.q +
-- skewjoin_mapjoin10.q + skewjoin_mapjoin11.q — skew-join optimization
-- under a MAPJOIN across the family's shapes: inner, left outer on the
-- skewed side, and a residual-filtered join; counts must match the
-- unoptimized plan.
set hive.optimize.skewjoin=true;
set hive.skewjoin.key=50;
DROP TABLE IF EXISTS g1146_skew;
CREATE TABLE g1146_skew USING parquet AS
  SELECT CASE WHEN l_orderkey % 4 = 0 THEN 1
              ELSE CAST(l_orderkey % 25 AS INT) END AS key,
         l_returnflag AS value
  FROM lineitem WHERE l_orderkey < 1500;
SELECT
  (SELECT count(*) FROM g1146_skew s
   JOIN nation n ON s.key = n.n_nationkey) AS inner_cnt,
  (SELECT count(*) FROM g1146_skew s
   LEFT OUTER JOIN nation n ON s.key = n.n_nationkey) AS loj_cnt,
  (SELECT count(*) FROM
     (SELECT /*+ MAPJOIN(n) */ s.key FROM g1146_skew s
      JOIN nation n ON s.key = n.n_nationkey AND n.n_nationkey < 10) x) AS hinted_res,
  (SELECT count(DISTINCT key) FROM g1146_skew) AS dk
