-- groupby_sort_6.q: group by over a partition that does NOT exist is
-- empty — and an INSERT OVERWRITE of that empty result CLEARS a
-- previously-filled sink; the loaded partition aggregates normally.
DROP TABLE IF EXISTS g754_t1;
DROP TABLE IF EXISTS g754_o1;
DROP TABLE IF EXISTS g754_o2;
CREATE TABLE g754_t1 (key STRING, val STRING) PARTITIONED BY (ds STRING);
CREATE TABLE g754_o1 (key INT, cnt INT);
CREATE TABLE g754_o2 (key INT, cnt INT);
INSERT INTO g754_t1 PARTITION (ds='2') VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g754_o1 SELECT key, count(1) FROM g754_t1 WHERE ds = '2' GROUP BY key;
INSERT OVERWRITE TABLE g754_o2 SELECT key, count(1) FROM g754_t1 WHERE ds = '2' GROUP BY key;
INSERT OVERWRITE TABLE g754_o2 SELECT key, count(1) FROM g754_t1 WHERE ds = '1' GROUP BY key;
SELECT 'd2' AS tag, key, cnt FROM g754_o1
UNION ALL
SELECT 'overwritten_empty' AS tag, key, cnt FROM g754_o2
