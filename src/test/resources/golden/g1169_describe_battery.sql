-- reference: ql/src/test/queries/clientpositive/describe_syntax.q +
-- desc_tbl_part_cols.q + describe_comment_indent.q +
-- describe_comment_nonascii.q — DESCRIBE forms: db.table, a single
-- column, a partitioned table's key section, and column COMMENTs
-- including multi-line and non-ascii text.
CREATE DATABASE IF NOT EXISTS g1169_db;
DROP TABLE IF EXISTS g1169_db.t;
CREATE TABLE g1169_db.t (
  col1 INT COMMENT 'col1 one line comment',
  col2 STRING COMMENT 'col2
two lines comment',
  col3 STRING COMMENT 'French: déjà vu; Chinese: 中文'
) PARTITIONED BY (ds STRING, part STRING) STORED AS PARQUET;
DESCRIBE g1169_db.t;
DESCRIBE g1169_db.t col1;
DESCRIBE g1169_db.t
