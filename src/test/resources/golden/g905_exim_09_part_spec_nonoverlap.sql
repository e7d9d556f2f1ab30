-- exim_09_part_spec_nonoverlap.q: importing a partitioned dump into an
-- EXISTING partitioned table succeeds when the incoming partitions do
-- not overlap the existing ones — the new partitions land NEXT TO the
-- old (overlap would refuse, pinned by n103-family negatives).
DROP TABLE IF EXISTS g905_emp;
DROP TABLE IF EXISTS g905_dst;
CREATE TABLE g905_emp (emp_id INT) USING parquet
  PARTITIONED BY (emp_country STRING);
INSERT INTO g905_emp PARTITION (emp_country='in') VALUES (1), (2);
EXPORT TABLE g905_emp TO '/tmp/graft_g905_exp';
CREATE TABLE g905_dst (emp_id INT) USING parquet
  PARTITIONED BY (emp_country STRING);
INSERT INTO g905_dst PARTITION (emp_country='us') VALUES (9);
IMPORT TABLE g905_dst FROM '/tmp/graft_g905_exp';
SELECT emp_country, count(*) AS n, sum(emp_id) AS s
FROM g905_dst GROUP BY emp_country ORDER BY emp_country
