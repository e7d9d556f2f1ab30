-- exim_08_nonpart_rename.q: IMPORT under a DIFFERENT table name while a
-- table with the exported name still exists (differently shaped, even)
-- — the import targets only the named table; the original is untouched.
DROP TABLE IF EXISTS g901_dept;
DROP TABLE IF EXISTS g901_imported_dept;
CREATE TABLE g901_dept (dep_id INT) USING parquet;
INSERT INTO g901_dept VALUES (1), (2), (3);
EXPORT TABLE g901_dept TO '/tmp/graft_g901_exp';
IMPORT TABLE g901_imported_dept FROM '/tmp/graft_g901_exp';
SELECT (SELECT count(*) FROM g901_dept) AS original_rows,
       (SELECT count(*) FROM g901_imported_dept) AS imported_rows,
       (SELECT sum(dep_id) FROM g901_imported_dept) AS imported_sum
