-- vector_char_simple.q: char(10)/char(20) columns written from plain
-- strings order and limit exactly like their string source ("should
-- match the query from src"), and an INT implicitly converts on INSERT
-- into a char(12) column.
DROP TABLE IF EXISTS g882_char2;
CREATE TABLE g882_char2 (key CHAR(10), value CHAR(20)) USING parquet;
INSERT OVERWRITE TABLE g882_char2
  SELECT n_name, concat('nation ', n_name) FROM nation;
DROP TABLE IF EXISTS g882_char3;
CREATE TABLE g882_char3 (field CHAR(12)) USING parquet;
INSERT INTO g882_char3 SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3;
SELECT key, value, (SELECT count(*) FROM g882_char3) AS converted
FROM g882_char2 ORDER BY key ASC LIMIT 5
