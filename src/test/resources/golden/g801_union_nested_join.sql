-- cbo_union.q: nested UNION ALLs (a union inside a union) joined against
-- another nested union on the shared key, filtered and ordered.
SELECT r2.key FROM
  (SELECT key FROM
     (SELECT n_nationkey AS key FROM nation
      UNION ALL
      SELECT r_regionkey AS key FROM region WHERE r_regionkey >= 0) r1
   UNION ALL
   SELECT r_regionkey AS key FROM region) r2
JOIN
  (SELECT key FROM
     (SELECT n_nationkey AS key FROM nation
      UNION ALL
      SELECT r_regionkey AS key FROM region WHERE r_regionkey >= 0) r1
   UNION ALL
   SELECT r_regionkey AS key FROM region) r3
ON r2.key = r3.key
WHERE r3.key >= 20
ORDER BY r2.key
