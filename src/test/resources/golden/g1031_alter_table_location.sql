-- reference: ql/src/test/queries/clientpositive/alter_table_location.q —
-- ALTER TABLE ... SET LOCATION re-points storage (SHOW TABLE EXTENDED
-- reflects it); rows written before the move stay at the OLD location,
-- so after the move the table reads only what lands at the new one
-- (the INSERT OVERWRITE also clears any prior run's leftovers there).
DROP TABLE IF EXISTS g1031_t;
CREATE TABLE g1031_t (a INT, b STRING) USING parquet;
INSERT INTO g1031_t VALUES (1, 'before');
SHOW TABLE EXTENDED LIKE 'g1031_t';
ALTER TABLE g1031_t SET LOCATION '/tmp/graft_g1031_moved';
INSERT OVERWRITE TABLE g1031_t SELECT 2, 'after';
SELECT a, b FROM g1031_t;
