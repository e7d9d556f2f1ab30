-- alter_change_col.q: ALTER TABLE CHANGE — rename + retype + reposition
-- in one statement (rename_column.q family). The CoW engine rewrites the
-- rows through a projection; DESCRIBE pins the new name/type/order and
-- the final SELECT proves the data survived both changes.
DROP TABLE IF EXISTS g340_t;
CREATE TABLE g340_t (a INT, b STRING, c DOUBLE) USING parquet;
INSERT INTO g340_t VALUES (1, 'x', 1.5), (2, 'y', 2.5);
ALTER TABLE g340_t CHANGE a a_renamed BIGINT AFTER b;
ALTER TABLE g340_t CHANGE COLUMN c c DECIMAL(6,2) FIRST;
DESCRIBE g340_t;
