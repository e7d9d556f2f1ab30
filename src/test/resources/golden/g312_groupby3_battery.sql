-- groupby3.q: the nine-aggregate battery over one ungrouped scan. Hive's
-- std/stddev/variance are POPULATION statistics (FunctionRegistry.java:
-- 348-354); Spark's same-named aliases are sample statistics, so
-- Engine.install re-points the ambiguous names — c6/c7 must equal the
-- explicit stddev_pop (c8), and c9 the explicit var_pop (c10).
SELECT round(sum(l_quantity), 2)            AS c1,
       round(avg(l_quantity), 6)            AS c2,
       round(avg(DISTINCT l_quantity), 6)   AS c3,
       max(l_quantity)                      AS c4,
       min(l_quantity)                      AS c5,
       round(std(l_quantity), 6)            AS c6,
       round(stddev(l_quantity), 6)         AS c7,
       round(stddev_pop(l_quantity), 6)     AS c8,
       round(variance(l_quantity), 6)       AS c9,
       round(var_pop(l_quantity), 6)        AS c10,
       round(stddev_samp(l_quantity), 6)    AS c11,
       round(var_samp(l_quantity), 6)       AS c12
FROM lineitem;
