-- partition_date2.q / partition_int: non-string partition column types —
-- DATE and INT partition keys, pruning predicates compare typed values.
DROP TABLE IF EXISTS g336_t;
CREATE TABLE g336_t (v STRING, dt DATE, n INT) USING parquet PARTITIONED BY (dt, n);
INSERT INTO g336_t PARTITION (dt=date'2000-01-01', n=1) VALUES ('a');
INSERT INTO g336_t PARTITION (dt=date'2000-02-01', n=2) VALUES ('b');
INSERT INTO g336_t PARTITION (dt=date'2000-03-01', n=3) VALUES ('c');
SELECT v, dt, n FROM g336_t
WHERE dt >= date'2000-02-01' AND n < 3
ORDER BY dt;
