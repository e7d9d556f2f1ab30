-- order by null placement: Hive sorts NULL first ascending / last
-- descending by default; explicit NULLS FIRST/LAST overrides. Positions
-- pinned via row_number (the only deterministic way to observe a sort).
DROP TABLE IF EXISTS g496_t;
CREATE TABLE g496_t (k INT, v STRING);
INSERT INTO g496_t VALUES (3,'c'), (NULL,'x'), (1,'a'), (NULL,'y'), (2,'b');
SELECT 'asc_default' AS tag, pos, coalesce(cast(k AS STRING), 'N') AS kv
FROM (SELECT k, row_number() OVER (ORDER BY k) AS pos FROM g496_t) t1
UNION ALL
SELECT 'desc_default', pos, coalesce(cast(k AS STRING), 'N')
FROM (SELECT k, row_number() OVER (ORDER BY k DESC) AS pos FROM g496_t) t2
UNION ALL
SELECT 'asc_nulls_last', pos, coalesce(cast(k AS STRING), 'N')
FROM (SELECT k, row_number() OVER (ORDER BY k ASC NULLS LAST) AS pos FROM g496_t) t3
UNION ALL
SELECT 'desc_nulls_first', pos, coalesce(cast(k AS STRING), 'N')
FROM (SELECT k, row_number() OVER (ORDER BY k DESC NULLS FIRST) AS pos FROM g496_t) t4
