-- alter_fileformat.q partitioned leg: whole-table SET FILEFORMAT on a
-- PARTITIONED table — the CTAS swap preserves the partition layout and
-- rediscovers partition locations after the rename.
DROP TABLE IF EXISTS g342_t;
CREATE TABLE g342_t (v STRING, p STRING) USING parquet PARTITIONED BY (p);
INSERT INTO g342_t PARTITION (p='x') VALUES ('a'), ('b');
INSERT INTO g342_t PARTITION (p='y') VALUES ('c');
ALTER TABLE g342_t SET FILEFORMAT ORC;
SELECT p, v FROM g342_t WHERE p = 'x' ORDER BY v;
