-- exim_06_one_part.q: EXPORT ... PARTITION with a FULL spec dumps
-- exactly one leaf partition; the import holds only it.
DROP TABLE IF EXISTS g904_emp;
DROP TABLE IF EXISTS g904_emp2;
CREATE TABLE g904_emp (emp_id INT) USING parquet
  PARTITIONED BY (emp_country STRING, emp_state STRING);
INSERT INTO g904_emp PARTITION (emp_country='in', emp_state='tn') VALUES (1), (2);
INSERT INTO g904_emp PARTITION (emp_country='in', emp_state='ka') VALUES (3);
EXPORT TABLE g904_emp PARTITION (emp_country='in', emp_state='ka')
  TO '/tmp/graft_g904_exp';
IMPORT TABLE g904_emp2 FROM '/tmp/graft_g904_exp';
SELECT emp_country, emp_state, emp_id
FROM g904_emp2 ORDER BY emp_id
