-- groupby_rollup1.q: the WITH ROLLUP text form (vs GROUPING SETS),
-- grouping() to disambiguate NULL group keys.
SELECT l_returnflag AS rf, l_linestatus AS ls, count(1) AS n,
       grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
FROM lineitem
GROUP BY l_returnflag, l_linestatus WITH ROLLUP
