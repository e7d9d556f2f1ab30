-- alter_change_col.q data leg: values survive the rename/retype/reorder
-- rewrites, including on a PARTITIONED table (partition column pinned in
-- place, data columns reshaped around it).
DROP TABLE IF EXISTS g341_t;
CREATE TABLE g341_t (v STRING, n INT, p STRING) USING parquet PARTITIONED BY (p);
INSERT INTO g341_t PARTITION (p='x') VALUES ('a', 1), ('b', 2);
INSERT INTO g341_t PARTITION (p='y') VALUES ('c', 3);
ALTER TABLE g341_t CHANGE n num BIGINT FIRST;
SELECT p, num, v FROM g341_t ORDER BY num;
