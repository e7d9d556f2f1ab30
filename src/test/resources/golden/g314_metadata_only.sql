-- metadata_only_queries.q: aggregates over partition columns only —
-- min/max/distinct of the partition key (answerable from partition
-- metadata; Spark's OptimizeMetadataOnlyQuery / partition listing).
DROP TABLE IF EXISTS g314_t;
CREATE TABLE g314_t (v INT, p STRING) USING parquet PARTITIONED BY (p);
INSERT INTO g314_t PARTITION (p='a') VALUES (1), (2);
INSERT INTO g314_t PARTITION (p='b') VALUES (3);
INSERT INTO g314_t PARTITION (p='c') VALUES (4);
SELECT max(p) AS mx, min(p) AS mn, count(DISTINCT p) AS ndp, count(*) AS n
FROM g314_t;
