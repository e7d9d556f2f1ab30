-- vectorization_short_regress.q (String class): substr/upper/length
-- under filters and aggregation.
SELECT substr(l_returnflag, 1, 1) AS f,
       count(DISTINCT l_linestatus) AS statuses,
       max(length(l_returnflag)) AS maxlen,
       min(upper(l_linestatus)) AS firststatus
FROM lineitem
WHERE l_orderkey < 2000
GROUP BY substr(l_returnflag, 1, 1)
ORDER BY f;
