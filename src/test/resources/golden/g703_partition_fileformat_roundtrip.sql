-- reference: ql/src/test/queries/clientpositive/alter_file_format.q:
-- a partition altered away and back to the base format reads uniformly
DROP TABLE IF EXISTS g703_t;
CREATE TABLE g703_t (k STRING) USING PARQUET PARTITIONED BY (dt STRING);
INSERT INTO g703_t VALUES ('x', '2010'), ('y', '2011');
ALTER TABLE g703_t PARTITION (dt='2010') SET FILEFORMAT RCFILE;
INSERT OVERWRITE TABLE g703_t PARTITION (dt='2010') SELECT 'x2';
ALTER TABLE g703_t PARTITION (dt='2010') SET FILEFORMAT PARQUET;
INSERT OVERWRITE TABLE g703_t PARTITION (dt='2010') SELECT 'x3';
SELECT k, dt FROM g703_t ORDER BY dt;
