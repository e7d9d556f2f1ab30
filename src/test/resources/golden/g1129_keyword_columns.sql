-- reference: ql/src/test/queries/clientpositive/keyword_1.q — columns
-- named `user` and `role` (non-reserved) work bare; `group` requires
-- backquotes; SHOW GRANT lists the select grant on the table.
DROP TABLE IF EXISTS g1129_test_user;
CREATE TABLE g1129_test_user (user STRING, `group` STRING) USING parquet;
GRANT SELECT ON TABLE g1129_test_user TO USER g1129_hive_test;
INSERT INTO g1129_test_user VALUES ('u1', 'g1'), ('u2', 'g2');
DROP TABLE IF EXISTS g1129_test_role;
CREATE TABLE g1129_test_role (role STRING, `group` STRING) USING parquet;
INSERT INTO g1129_test_role VALUES ('r1', 'g1');
SELECT (SELECT count(user) FROM g1129_test_user) AS n_user,
       (SELECT min(`group`) FROM g1129_test_user) AS mn_group,
       (SELECT role FROM g1129_test_role) AS the_role
