-- reference: ql/src/test/queries/clientpositive/load_overwrite.q +
-- load_fs.q + load_fs2.q + load_file_with_space_in_the_name.q +
-- import_exported_table.q — LOAD DATA INPATH from engine-written text
-- files: INTO appends, OVERWRITE replaces, and a source file whose
-- name contains a SPACE loads.
DROP TABLE IF EXISTS g1175_stage;
DROP TABLE IF EXISTS g1175_t;
CREATE TABLE g1175_stage (line STRING) STORED AS TEXTFILE;
INSERT INTO g1175_stage
  SELECT concat(n_nationkey, '', n_name) FROM nation WHERE n_nationkey < 5;
INSERT OVERWRITE DIRECTORY '${GOLDTMP}/load src files'
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey < 5;
CREATE TABLE g1175_t (k STRING, v STRING) STORED AS TEXTFILE;
LOAD DATA INPATH '${GOLDTMP}/load src files' INTO TABLE g1175_t;
INSERT OVERWRITE DIRECTORY '${GOLDTMP}/load2'
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation
  WHERE n_nationkey BETWEEN 5 AND 7;
LOAD DATA INPATH '${GOLDTMP}/load2' INTO TABLE g1175_t;
INSERT OVERWRITE DIRECTORY '${GOLDTMP}/load3'
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation
  WHERE n_nationkey = 9;
LOAD DATA INPATH '${GOLDTMP}/load3' OVERWRITE INTO TABLE g1175_t;
SELECT count(*) AS n, min(k) AS mn FROM g1175_t
