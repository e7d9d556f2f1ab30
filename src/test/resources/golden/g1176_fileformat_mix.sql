-- reference: ql/src/test/queries/clientpositive/fileformat_mix.q +
-- fileformat_sequencefile.q + fileformat_text.q — SEQUENCEFILE and
-- TEXTFILE tables side by side, unioned in one read.
DROP TABLE IF EXISTS g1176_seq;
DROP TABLE IF EXISTS g1176_txt;
CREATE TABLE g1176_seq (key INT, value STRING) STORED AS SEQUENCEFILE;
CREATE TABLE g1176_txt (key INT, value STRING) STORED AS TEXTFILE;
INSERT INTO g1176_seq
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 5;
INSERT INTO g1176_txt
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey >= 5 AND n_nationkey < 9;
SELECT 'seq' AS src, key, value FROM g1176_seq
UNION ALL
SELECT 'txt', key, value FROM g1176_txt
