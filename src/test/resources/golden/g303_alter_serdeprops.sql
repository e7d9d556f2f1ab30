-- alter_table_serde.q: ALTER TABLE SET SERDEPROPERTIES — serde metadata
-- updates must not disturb the data path (Spark stores them as table
-- options; reads stay intact).
DROP TABLE IF EXISTS g303_t;
CREATE TABLE g303_t (k INT, v STRING) USING parquet;
INSERT INTO g303_t VALUES (1, 'a'), (2, 'b');
ALTER TABLE g303_t SET SERDEPROPERTIES ('field.delim' = ',', 'serialization.format' = ',');
ALTER TABLE g303_t SET TBLPROPERTIES ('note' = 'post-serde');
SELECT k, v FROM g303_t ORDER BY k;
