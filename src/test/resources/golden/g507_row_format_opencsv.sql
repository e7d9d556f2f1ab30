-- ROW FORMAT SERDE OpenCSVSerde WITH SERDEPROPERTIES — custom separator
-- and quote characters map onto the csv source options; quoted field
-- containing the separator survives the round-trip.
DROP TABLE IF EXISTS g507_t;
CREATE TABLE g507_t (k STRING, v STRING)
ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.OpenCSVSerde'
WITH SERDEPROPERTIES ('separatorChar' = ';', 'quoteChar' = '"')
STORED AS TEXTFILE;
INSERT INTO g507_t VALUES ('1', 'plain'), ('2', 'has;separator'), ('3', 'has"quote');
SELECT k, v, length(v) AS len FROM g507_t
