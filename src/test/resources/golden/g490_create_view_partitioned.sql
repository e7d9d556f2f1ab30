-- create_view_partitioned.q: PARTITIONED ON in a view definition is
-- Hive metadata only (the underlying table need not be partitioned);
-- the clause is accepted and the view reads normally.
DROP VIEW IF EXISTS g490_vp;
DROP TABLE IF EXISTS g490_base;
CREATE TABLE g490_base (n_name STRING, n_regionkey INT);
INSERT INTO g490_base VALUES ('ALG', 0), ('ARG', 1), ('BRA', 1), ('CAN', 1), ('EGY', 4);
CREATE VIEW g490_vp
PARTITIONED ON (n_regionkey)
AS
SELECT n_name, n_regionkey
FROM g490_base
WHERE n_regionkey < 4;
SELECT n_name, n_regionkey FROM g490_vp
