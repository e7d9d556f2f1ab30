WITH a AS (SELECT o_custkey, sum(o_totalprice) AS tot FROM orders GROUP BY o_custkey),
     b AS (SELECT * FROM a WHERE tot > 500000),
     c AS (SELECT b.o_custkey, tot, c_nationkey FROM b JOIN customer ON o_custkey = c_custkey)
SELECT c_nationkey, count(*) AS n, sum(tot) AS s FROM c GROUP BY c_nationkey
