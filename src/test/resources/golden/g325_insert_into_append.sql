-- insert_into1.q: INSERT INTO appends (never overwrites); three inserts
-- accumulate, then an OVERWRITE resets.
DROP TABLE IF EXISTS g325_t;
CREATE TABLE g325_t (k INT) USING parquet;
INSERT INTO g325_t VALUES (1);
INSERT INTO g325_t VALUES (2), (3);
INSERT INTO TABLE g325_t SELECT r_regionkey FROM region;
INSERT OVERWRITE TABLE g325_t VALUES (99);
SELECT count(*) AS n, max(k) AS mx FROM g325_t;
