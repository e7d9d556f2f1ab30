-- constprog_type.q: constant propagation across TYPED constants — a
-- date and a double-epoch timestamp written through INSERT, and a
-- predicate comparing an int key against a DOUBLE constant.
DROP TABLE IF EXISTS g857_d;
CREATE TABLE g857_d (d DATE, t TIMESTAMP) USING parquet;
INSERT OVERWRITE TABLE g857_d
SELECT cast('2013-11-17' as date),
       cast(cast('1.3041352164485E9' as double) as timestamp);
SELECT 'ins' AS tag, CAST(d AS STRING) AS a, CAST(t AS STRING) AS b FROM g857_d
UNION ALL
SELECT 'cmp', CAST(n_nationkey AS STRING), n_name
FROM nation WHERE n_nationkey = cast(8 as double)
