-- exim_05_some_part.q: EXPORT ... PARTITION with a PARTIAL (leading
-- prefix) spec dumps every partition under it — emp_country='in' takes
-- both states, the us partition never leaves the source.
DROP TABLE IF EXISTS g903_emp;
DROP TABLE IF EXISTS g903_emp2;
CREATE TABLE g903_emp (emp_id INT) USING parquet
  PARTITIONED BY (emp_country STRING, emp_state STRING);
INSERT INTO g903_emp PARTITION (emp_country='in', emp_state='tn') VALUES (1), (2);
INSERT INTO g903_emp PARTITION (emp_country='in', emp_state='ka') VALUES (3);
INSERT INTO g903_emp PARTITION (emp_country='us', emp_state='ca') VALUES (4);
EXPORT TABLE g903_emp PARTITION (emp_country='in') TO '/tmp/graft_g903_exp';
IMPORT TABLE g903_emp2 FROM '/tmp/graft_g903_exp';
SELECT emp_country, emp_state, count(*) AS n
FROM g903_emp2 GROUP BY emp_country, emp_state
ORDER BY emp_country, emp_state
