-- reference: ql/src/test/queries/clientpositive/exim_01_nonpart.q +
-- exim_02_part.q + exim_00_nonpart_empty.q — EXPORT of a plain table,
-- an EMPTY table, and a partitioned table; IMPORT into another
-- DATABASE recreates schema, data, and partitions.
DROP DATABASE IF EXISTS g1156_importer CASCADE;
DROP TABLE IF EXISTS g1156_dept;
DROP TABLE IF EXISTS g1156_empty;
DROP TABLE IF EXISTS g1156_emp;
CREATE TABLE g1156_dept (dep_id INT) USING parquet;
INSERT INTO g1156_dept SELECT CAST(n_nationkey AS INT) FROM nation;
CREATE TABLE g1156_empty (e INT) USING parquet;
CREATE TABLE g1156_emp (emp_id INT)
  PARTITIONED BY (emp_country STRING, emp_state STRING) STORED AS PARQUET;
INSERT INTO g1156_emp PARTITION (emp_country='in', emp_state='tn')
  SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey < 5;
INSERT INTO g1156_emp PARTITION (emp_country='in', emp_state='ka')
  SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey >= 5 AND n_nationkey < 8;
EXPORT TABLE g1156_dept TO '${GOLDTMP}/exports/dept';
EXPORT TABLE g1156_empty TO '${GOLDTMP}/exports/empty';
EXPORT TABLE g1156_emp TO '${GOLDTMP}/exports/emp';
CREATE DATABASE g1156_importer;
USE g1156_importer;
IMPORT TABLE g1156_dept FROM '${GOLDTMP}/exports/dept';
IMPORT TABLE g1156_empty FROM '${GOLDTMP}/exports/empty';
IMPORT TABLE g1156_emp FROM '${GOLDTMP}/exports/emp';
USE default;
SELECT (SELECT count(*) FROM g1156_importer.g1156_dept) AS n_dept,
       (SELECT count(*) FROM g1156_importer.g1156_empty) AS n_empty,
       (SELECT count(*) FROM g1156_importer.g1156_emp) AS n_emp,
       (SELECT count(DISTINCT emp_state) FROM g1156_importer.g1156_emp) AS n_states
