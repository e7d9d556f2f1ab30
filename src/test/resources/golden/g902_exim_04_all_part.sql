-- exim_04_all_part.q: a partitioned export carries every partition with
-- its directory layout; the fresh import recreates the table
-- PARTITIONED BY the descriptor's columns and recovers all partitions.
DROP TABLE IF EXISTS g902_emp;
DROP TABLE IF EXISTS g902_emp2;
CREATE TABLE g902_emp (emp_id INT) USING parquet
  PARTITIONED BY (emp_country STRING, emp_state STRING);
INSERT INTO g902_emp PARTITION (emp_country='in', emp_state='tn') VALUES (1), (2);
INSERT INTO g902_emp PARTITION (emp_country='in', emp_state='ka') VALUES (3);
INSERT INTO g902_emp PARTITION (emp_country='us', emp_state='ca') VALUES (4);
EXPORT TABLE g902_emp TO '/tmp/graft_g902_exp';
IMPORT TABLE g902_emp2 FROM '/tmp/graft_g902_exp';
SELECT emp_country, emp_state, count(*) AS n, sum(emp_id) AS s
FROM g902_emp2 GROUP BY emp_country, emp_state
ORDER BY emp_country, emp_state
