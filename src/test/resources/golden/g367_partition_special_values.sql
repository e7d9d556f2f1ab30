-- escape2.q shape: partition values holding spaces, percent and plus signs
-- must round-trip through the store (Hive escapes them in the path)
DROP TABLE IF EXISTS g367_t;
CREATE TABLE g367_t (k INT) USING parquet PARTITIONED BY (ds STRING);
INSERT INTO g367_t PARTITION (ds='a b') VALUES (1);
INSERT INTO g367_t PARTITION (ds='50%') VALUES (2);
INSERT INTO g367_t PARTITION (ds='x+y') VALUES (3);
SELECT k, ds FROM g367_t WHERE ds = '50%'
UNION ALL
SELECT k, ds FROM g367_t WHERE ds = 'a b'
UNION ALL
SELECT k, ds FROM g367_t WHERE ds = 'x+y'
