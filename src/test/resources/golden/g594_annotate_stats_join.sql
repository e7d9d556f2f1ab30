-- annotate_stats_join.q: column-level ANALYZE on both join sides, then
-- the join itself — statistics gathering must never change answers, and
-- the CBO consumes the column stats for join estimation.
DROP TABLE IF EXISTS g594_emp;
DROP TABLE IF EXISTS g594_dept;
CREATE TABLE g594_emp USING parquet AS
  SELECT n_name AS lastname, n_regionkey AS deptid, n_nationkey AS locid FROM nation;
CREATE TABLE g594_dept USING parquet AS
  SELECT r_regionkey AS deptid, r_name AS deptname FROM region;
ANALYZE TABLE g594_emp COMPUTE STATISTICS;
ANALYZE TABLE g594_dept COMPUTE STATISTICS;
ANALYZE TABLE g594_emp COMPUTE STATISTICS FOR COLUMNS lastname, deptid, locid;
ANALYZE TABLE g594_dept COMPUTE STATISTICS FOR COLUMNS deptname, deptid;
SELECT d.deptname, COUNT(*) AS n, MIN(e.lastname) AS first_name
FROM g594_emp e JOIN g594_dept d ON e.deptid = d.deptid
GROUP BY d.deptname
