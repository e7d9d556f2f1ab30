-- reference: ql/src/test/queries/clientnegative/exim_00_unsupported_schema.q
-- — EXPORT to a URI scheme no FileSystem serves.
-- ERROR-CONTAINS: No FileSystem for scheme | UnsupportedFileSystemException | unsupported
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exp1;
CREATE TABLE graft_tmp.neg_exp1 (k INT) USING parquet;
INSERT INTO graft_tmp.neg_exp1 VALUES (1);
EXPORT TABLE graft_tmp.neg_exp1 TO 'nosuchfs://bucket/path';
