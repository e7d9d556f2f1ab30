-- leftsemijoin.q + aggregation over the kept side
SELECT c.c_mktsegment, count(*) AS n FROM customer c
LEFT SEMI JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 100000
GROUP BY c.c_mktsegment
