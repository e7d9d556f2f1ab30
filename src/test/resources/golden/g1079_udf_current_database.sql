-- reference: ql/src/test/queries/clientpositive/udf_current_database.q —
-- current_database() tracks USE across databases and back.
CREATE DATABASE IF NOT EXISTS g1079_xxx;
USE g1079_xxx;
CREATE TABLE g1079_probe AS SELECT current_database() AS in_xxx;
USE default;
SELECT p.in_xxx, current_database() AS back_in_default
FROM g1079_xxx.g1079_probe p
