-- skewjoin.q, skewjoin_noskew.q, skewjoinopt3.q, skewjoinopt4.q,
-- skewjoinopt5.q, skewjoinopt6.q, skewjoinopt8.q, skewjoinopt10.q,
-- skewjoinopt12.q, skewjoinopt13.q, skewjoinopt14.q, skewjoinopt15.q,
-- skewjoinopt16.q, skewjoinopt17.q, skewjoinopt18.q, skewjoinopt19.q,
-- skewjoinopt20.q,
-- skewjoin_union_remove_2.q: the remaining skew-optimization matrix —
-- flags pick plans (compile-time union split in Hive, AQE here), the
-- answers are pinned once: skewed outer join, skew on BOTH sides,
-- skew key in a union consumed downstream.
DROP TABLE IF EXISTS g659_s;
CREATE TABLE g659_s USING parquet AS
  SELECT CASE WHEN l_linenumber >= 3 THEN 7 ELSE CAST(l_orderkey % 23 AS INT) END AS k,
         CAST(l_quantity AS INT) AS q
  FROM lineitem WHERE l_orderkey < 700;
SELECT 'both_sides_skew' AS tag, COUNT(*) AS n FROM g659_s a JOIN g659_s b ON a.k = b.k
UNION ALL
SELECT 'skew_louter', COUNT(*) FROM g659_s a LEFT OUTER JOIN
  (SELECT DISTINCT k FROM g659_s WHERE k BETWEEN 5 AND 9) b ON a.k = b.k
UNION ALL
SELECT 'union_after_skew', COUNT(*) FROM (
  SELECT a.k FROM g659_s a JOIN g659_s b ON a.k = b.k WHERE a.k = 7
  UNION ALL
  SELECT k FROM g659_s WHERE k <> 7) u
