-- groupby_position.q: ordinal GROUP BY / ORDER BY positions (Hive's
-- hive.groupby.orderby.position.alias surface).
set hive.groupby.orderby.position.alias=true;
SELECT c_nationkey AS nk, c_mktsegment AS seg, count(1) AS cnt
FROM customer
WHERE c_nationkey < 5
GROUP BY 1, 2
ORDER BY 1, 2
