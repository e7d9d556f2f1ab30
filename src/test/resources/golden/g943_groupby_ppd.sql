-- groupby_ppd.q (HIVE-2382): predicate pushdown through a UNION ALL
-- subquery under a grouped HAVING — the having filter lands inside both
-- union branches without corrupting the group keys.
DROP TABLE IF EXISTS g943_invites;
CREATE TABLE g943_invites USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS id,
         CAST(n_regionkey AS INT) AS foo,
         CAST(n_nationkey % 3 AS INT) AS bar
  FROM nation;
SELECT * FROM
  (SELECT foo, bar FROM
    (SELECT bar, foo FROM g943_invites c
     UNION ALL
     SELECT bar, foo FROM g943_invites d) b) a
GROUP BY bar, foo HAVING bar = 1
