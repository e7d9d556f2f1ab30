-- join_empty.q: joins against an empty table — inner yields nothing,
-- outer pads, aggregates over the empty side return NULL/0 correctly.
DROP TABLE IF EXISTS g481_e;
CREATE TABLE g481_e (key INT, value STRING);
SELECT 'inner_cnt' AS tag, cast(count(1) AS STRING) AS v
FROM nation n JOIN g481_e e ON n.n_nationkey = e.key
UNION ALL
SELECT 'loj_rows', cast(count(1) AS STRING)
FROM nation n LEFT OUTER JOIN g481_e e ON n.n_nationkey = e.key
UNION ALL
SELECT 'loj_matched', cast(count(e.key) AS STRING)
FROM nation n LEFT OUTER JOIN g481_e e ON n.n_nationkey = e.key
UNION ALL
SELECT 'empty_agg', concat_ws(',', cast(count(1) AS STRING),
                              cast(sum(key) IS NULL AS STRING))
FROM g481_e
