-- alter_merge_orc.q: many small inserts create file fragments; ALTER
-- TABLE ... CONCATENATE compacts them; row contract unchanged.
DROP TABLE IF EXISTS g457_t;
CREATE TABLE g457_t (key INT, value STRING) STORED AS ORC;
INSERT INTO g457_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 8;
INSERT INTO g457_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 8 AND n_nationkey < 16;
INSERT INTO g457_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 16;
ALTER TABLE g457_t CONCATENATE;
SELECT count(*) AS n, min(key) AS mn, max(key) AS mx, sum(key) AS s FROM g457_t
