-- reference: ql/src/test/queries/clientpositive/external1.q +
-- external2.q + external_table_with_space_in_location_path.q +
-- insertexternal1.q — EXTERNAL tables over explicit locations
-- (including a path with a SPACE): insert, read, and DROP leaves the
-- data behind for a re-created table to find.
DROP TABLE IF EXISTS g1174_ext;
DROP TABLE IF EXISTS g1174_ext2;
CREATE EXTERNAL TABLE g1174_ext (k INT, v STRING)
  STORED AS PARQUET LOCATION '${GOLDTMP}/ext dir with space/t';
INSERT INTO g1174_ext
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 6;
DROP TABLE g1174_ext;
CREATE EXTERNAL TABLE g1174_ext2 (k INT, v STRING)
  STORED AS PARQUET LOCATION '${GOLDTMP}/ext dir with space/t';
SELECT count(*) AS survived, sum(k) AS sk FROM g1174_ext2
