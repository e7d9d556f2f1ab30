-- temp_table.q: CREATE TEMPORARY TABLE — session-scoped real tables that
-- accept INSERT (unlike views). The TEMPORARY keyword strips to a plain
-- table (session-end auto-drop is not provided; COVERAGE.md).
DROP TABLE IF EXISTS g332_tmp;
CREATE TEMPORARY TABLE g332_tmp (k INT, v STRING) STORED AS TEXTFILE;
INSERT INTO g332_tmp VALUES (1, 'a'), (2, 'b');
INSERT INTO g332_tmp SELECT r_regionkey + 10, r_name FROM region WHERE r_regionkey < 2;
SELECT k, v FROM g332_tmp ORDER BY k;
