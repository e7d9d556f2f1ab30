-- join4.q, join12.q, join16.q, join18.q, join19.q, join24.q, join34.q,
-- mapjoin1.q, mapjoin_mapjoin.q, mapjoin_subquery2.q,
-- mapjoin_memcheck.q, multi_join_union_src.q, temp_table_join1.q,
-- parquet_join.q, varchar_join1.q, join_merging.q: the residual join
-- stems — nested outer-of-subqueries (join4), double-grouped join
-- (join18 shape), counts-per-side (join19/24), a union as one join
-- input (multi_join_union_src), a TEMPORARY VIEW side
-- (temp_table_join1), varchar keys, and merged consecutive joins.
CREATE OR REPLACE TEMPORARY VIEW g669_tmp AS
  SELECT n_nationkey AS k, n_name AS v FROM nation WHERE n_regionkey < 3;
SELECT 'outer_of_subq' AS tag, COUNT(*) AS n FROM
  (SELECT * FROM nation WHERE n_nationkey BETWEEN 3 AND 12) a
  LEFT OUTER JOIN (SELECT * FROM nation WHERE n_nationkey BETWEEN 8 AND 18) b
  ON a.n_nationkey = b.n_nationkey
UNION ALL
SELECT 'double_grouped', COUNT(*) FROM
  (SELECT n_regionkey, COUNT(*) AS c1 FROM nation GROUP BY n_regionkey) x
  JOIN (SELECT n_regionkey, COUNT(DISTINCT n_name) AS c2 FROM nation GROUP BY n_regionkey) y
  ON x.n_regionkey = y.n_regionkey AND x.c1 = y.c2
UNION ALL
SELECT 'union_input', COUNT(*) FROM
  (SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 0
   UNION ALL SELECT n_nationkey FROM nation WHERE n_regionkey = 1) u
  JOIN nation n ON u.k = n.n_nationkey
UNION ALL
SELECT 'temp_view_side', COUNT(*) FROM g669_tmp t JOIN nation n ON t.k = n.n_nationkey
UNION ALL
SELECT 'varchar_keys', COUNT(*) FROM
  (SELECT CAST(n_name AS VARCHAR(30)) AS vk FROM nation) a
  JOIN (SELECT CAST(n_name AS VARCHAR(12)) AS vk FROM nation) b ON a.vk = b.vk
UNION ALL
SELECT 'merged_joins', COUNT(*) FROM nation a
  JOIN region r1 ON a.n_regionkey = r1.r_regionkey
  JOIN region r2 ON a.n_regionkey = r2.r_regionkey
