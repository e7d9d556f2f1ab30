-- reference: ql/src/test/queries/clientpositive/alter_file_format.q
-- (partition leg) + partition_wise_fileformat.q: per-partition format
-- divergence — ALTER one partition to SEQUENCEFILE, reload it, and read
-- the whole table across the format boundary
DROP TABLE IF EXISTS g702_t;
CREATE TABLE g702_t (k STRING, n INT) USING PARQUET PARTITIONED BY (dt STRING);
INSERT INTO g702_t VALUES ('a', 1, '100'), ('b', 2, '100'), ('c', 3, '101');
ALTER TABLE g702_t PARTITION (dt='100') SET FILEFORMAT SEQUENCEFILE;
INSERT OVERWRITE TABLE g702_t PARTITION (dt='100') SELECT 'a2', 10;
INSERT INTO g702_t PARTITION (dt='100') SELECT 'b2', 20;
SELECT k, n, dt FROM g702_t ORDER BY dt, k;
