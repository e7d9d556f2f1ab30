-- filter_join_breaktask.q: LOJ chain where a NOT-NULL/<>'' filter on the
-- padded side lands after the join, then feeds a second join.
DROP TABLE IF EXISTS g445_t;
CREATE TABLE g445_t (key INT, value STRING);
INSERT INTO g445_t VALUES (1,''), (2,'v2'), (3,'v3'), (5,''), (8,'v8');
SELECT f.key AS k, g.value AS gv
FROM g445_t f
JOIN g445_t m ON (f.key = m.key AND m.key < 6)
JOIN g445_t g ON (g.value = m.value AND g.key < 6 AND m.value <> '')
