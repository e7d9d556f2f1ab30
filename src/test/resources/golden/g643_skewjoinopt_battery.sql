-- skewjoinopt2.q..skewjoinopt7.q representatives: joins with a heavily
-- skewed key (most rows share one key) in inner and outer forms — the
-- skew optimization (runtime AQE here, compile-time union in Hive) must
-- keep the full fan-out of the hot key.
DROP TABLE IF EXISTS g643_s;
CREATE TABLE g643_s USING parquet AS
  SELECT CASE WHEN l_linenumber > 1 THEN 0 ELSE CAST(l_orderkey % 50 AS INT) END AS k,
         CAST(l_quantity AS INT) AS q
  FROM lineitem WHERE l_orderkey < 600;
SELECT 'hot_inner' AS tag, COUNT(*) AS n FROM g643_s a JOIN g643_s b ON a.k = b.k WHERE a.k = 0
UNION ALL
SELECT 'cold_inner', COUNT(*) FROM g643_s a JOIN g643_s b ON a.k = b.k WHERE a.k <> 0
UNION ALL
SELECT 'louter_total', COUNT(*) FROM g643_s a LEFT OUTER JOIN
  (SELECT DISTINCT k FROM g643_s WHERE k < 10) b ON a.k = b.k
