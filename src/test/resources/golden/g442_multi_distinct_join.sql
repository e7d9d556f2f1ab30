-- auto_join18_multi_distinct.q: outer join of two aggregating subqueries,
-- one with plain count, one with TWO distinct aggregates over different
-- columns — the multi-distinct expand must compose under the join.
SELECT a.c_nationkey AS nk, a.cnt AS cnt_cust, b.d_seg AS d_seg, b.d_mkt AS d_mkt
FROM (
  SELECT c_nationkey, count(c_custkey) AS cnt FROM customer GROUP BY c_nationkey
) a
FULL OUTER JOIN (
  SELECT c_nationkey, count(DISTINCT c_mktsegment) AS d_seg,
         count(DISTINCT substr(c_name, 1, 12)) AS d_mkt
  FROM customer GROUP BY c_nationkey
) b ON a.c_nationkey = b.c_nationkey
