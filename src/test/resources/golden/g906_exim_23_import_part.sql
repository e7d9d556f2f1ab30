-- exim_23_import_part_authsuccess.q (partition-selection shape): IMPORT
-- TABLE ... PARTITION (spec) FROM a full multi-partition dump restores
-- ONLY the named partition.
DROP TABLE IF EXISTS g906_emp;
DROP TABLE IF EXISTS g906_emp2;
CREATE TABLE g906_emp (emp_id INT) USING parquet
  PARTITIONED BY (emp_country STRING);
INSERT INTO g906_emp PARTITION (emp_country='in') VALUES (1), (2);
INSERT INTO g906_emp PARTITION (emp_country='us') VALUES (3);
EXPORT TABLE g906_emp TO '/tmp/graft_g906_exp';
IMPORT TABLE g906_emp2 PARTITION (emp_country='in') FROM '/tmp/graft_g906_exp';
SELECT emp_country, count(*) AS n FROM g906_emp2
GROUP BY emp_country ORDER BY emp_country
