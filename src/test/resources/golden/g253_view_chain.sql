-- views stacked on views with filters at each layer
DROP VIEW IF EXISTS g253_v3;
DROP VIEW IF EXISTS g253_v2;
DROP VIEW IF EXISTS g253_v1;
CREATE TEMPORARY VIEW g253_v1 AS SELECT o_custkey, o_totalprice, o_orderstatus FROM orders WHERE o_totalprice > 50000;
CREATE TEMPORARY VIEW g253_v2 AS SELECT o_custkey, count(*) AS n, max(o_totalprice) AS mx FROM g253_v1 WHERE o_orderstatus <> 'P' GROUP BY o_custkey;
CREATE TEMPORARY VIEW g253_v3 AS SELECT o_custkey, n, mx FROM g253_v2 WHERE n >= 2;
SELECT count(*) AS rows_, sum(n) AS total_n, round(max(mx) * 100) / 100 AS max_mx FROM g253_v3
