-- exim_03_nonpart_over_compat.q: IMPORT into an EXISTING compatible
-- (same columns, empty) table loads the exported rows into the
-- existing table's own location — the descriptor schema is validated
-- against the destination, not blindly recreated.
DROP TABLE IF EXISTS g900_dept;
CREATE TABLE g900_dept (dep_id INT) USING parquet;
INSERT INTO g900_dept SELECT n_nationkey FROM nation WHERE n_nationkey < 4;
EXPORT TABLE g900_dept TO '/tmp/graft_g900_exp';
DROP TABLE g900_dept;
CREATE TABLE g900_dept (dep_id INT) USING parquet;
IMPORT TABLE g900_dept FROM '/tmp/graft_g900_exp';
SELECT dep_id FROM g900_dept ORDER BY dep_id
