-- ROW FORMAT SERDE JsonSerDe (hcatalog class name) STORED AS TEXTFILE —
-- the named-serde CREATE form maps to the json source; round-trip.
DROP TABLE IF EXISTS g506_t;
CREATE TABLE g506_t (k INT, name STRING, tags ARRAY<STRING>)
ROW FORMAT SERDE 'org.apache.hive.hcatalog.data.JsonSerDe'
STORED AS TEXTFILE;
INSERT INTO g506_t VALUES (1, 'a', array('x','y')), (2, 'b', array());
SELECT k, name, size(tags) AS n_tags, tags[0] AS first_tag FROM g506_t
