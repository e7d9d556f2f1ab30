-- ppd_outer_join: a LEFT-side predicate inside LEFT JOIN's ON must not filter rows
SELECT count(*) AS n, count(o.o_orderkey) AS matched
FROM customer c LEFT OUTER JOIN orders o
ON c.c_custkey = o.o_custkey AND c.c_acctbal > 0 AND o.o_totalprice > 100000
