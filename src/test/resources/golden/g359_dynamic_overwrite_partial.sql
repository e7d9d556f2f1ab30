-- insert1_overwrite_partitions.q / HIVE dynamic-partition overwrite
-- semantics: INSERT OVERWRITE with a dynamic partition column replaces ONLY
-- the partitions the query writes; untouched partitions survive
DROP TABLE IF EXISTS g359_t;
CREATE TABLE g359_t (k INT, v STRING) USING parquet PARTITIONED BY (p INT);
INSERT INTO g359_t PARTITION (p=1) VALUES (1, 'old1'), (2, 'old2');
INSERT INTO g359_t PARTITION (p=2) VALUES (3, 'old3');
INSERT INTO g359_t PARTITION (p=3) VALUES (4, 'old4');
INSERT OVERWRITE TABLE g359_t PARTITION (p) SELECT 9, 'new', p FROM (SELECT 2 AS p UNION ALL SELECT 3) s;
SELECT * FROM g359_t ORDER BY p, k
