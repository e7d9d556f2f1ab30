-- dbtxnmgr_compact1.q/2.q: ALTER TABLE ... COMPACT 'major'/'minor' runs
-- the compactor inline (CoW has no deltas, so both compact file counts);
-- rows unchanged, SHOW COMPACTIONS stays empty.
DROP TABLE IF EXISTS g504_t;
CREATE TABLE g504_t (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g504_t PARTITION (ds='today') VALUES (1,'a'), (2,'b');
INSERT INTO g504_t PARTITION (ds='today') VALUES (3,'c');
ALTER TABLE g504_t PARTITION (ds='today') COMPACT 'major';
SHOW COMPACTIONS;
SELECT key, value, ds FROM g504_t
