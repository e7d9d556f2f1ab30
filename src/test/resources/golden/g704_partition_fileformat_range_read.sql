-- reference: ql/src/test/queries/clientpositive/partition_wise_fileformat2.q
-- three partitions in three formats read back through one range
-- predicate spanning the format boundary
DROP TABLE IF EXISTS g704_t;
CREATE TABLE g704_t (k STRING, dt INT) USING PARQUET PARTITIONED BY (dt);
INSERT INTO g704_t VALUES ('a', 100), ('b', 101), ('c', 102);
ALTER TABLE g704_t PARTITION (dt=101) SET FILEFORMAT SEQUENCEFILE;
INSERT OVERWRITE TABLE g704_t PARTITION (dt=101) SELECT 'b2';
ALTER TABLE g704_t PARTITION (dt=102) SET FILEFORMAT ORC;
INSERT OVERWRITE TABLE g704_t PARTITION (dt=102) SELECT 'c2';
SELECT k, dt FROM g704_t WHERE dt >= 100 AND dt <= 102 ORDER BY dt;
