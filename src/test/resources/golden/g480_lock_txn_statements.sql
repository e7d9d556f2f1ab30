-- lockneg/insert_overwrite_local... era scripts: LOCK/UNLOCK TABLE,
-- SHOW TRANSACTIONS, SHOW COMPACTIONS, ABORT TRANSACTIONS all accepted
-- (no lock/txn manager under copy-on-write); the script keeps running
-- and the data statements still land.
DROP TABLE IF EXISTS g480_t;
CREATE TABLE g480_t (k INT, v STRING);
LOCK TABLE g480_t EXCLUSIVE;
INSERT INTO g480_t VALUES (1,'a'), (2,'b');
UNLOCK TABLE g480_t;
SHOW TRANSACTIONS;
SHOW COMPACTIONS;
ABORT TRANSACTIONS 101, 102;
SELECT k, v FROM g480_t
