-- optimize_nullscan.q: WHERE false branches — aggregates over a provably
-- empty scan. Global aggregate still emits its one row (count 0, null
-- min/max); grouped aggregate emits nothing; union keeps the live branch.
SELECT 'global' AS tag, count(*) AS cnt, max(n_name) AS mx FROM nation WHERE 1 = 0
UNION ALL
SELECT 'live', count(*), max(r_name) FROM region
UNION ALL
SELECT 'grouped', cnt, NULL FROM
  (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nation WHERE false GROUP BY n_regionkey) g
ORDER BY tag;
