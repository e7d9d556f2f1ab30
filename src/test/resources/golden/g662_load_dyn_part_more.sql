-- load_dyn_part5.q, load_dyn_part6.q, load_dyn_part7.q,
-- load_dyn_part10.q, load_dyn_part11.q, load_dyn_part12.q,
-- load_dyn_part13.q, load_dyn_part15.q: the remaining dynamic-partition
-- edges — repeated overwrite of the same dynamic set, INT partition
-- column, two dynamic levels where the FIRST is low-cardinality, and
-- append-after-overwrite.
DROP TABLE IF EXISTS g662_t;
CREATE TABLE g662_t (v STRING) USING parquet PARTITIONED BY (r INT, par STRING);
INSERT OVERWRITE TABLE g662_t PARTITION (r, par)
  SELECT n_name, CAST(n_regionkey AS INT), CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END FROM nation;
INSERT OVERWRITE TABLE g662_t PARTITION (r, par)
  SELECT CONCAT('x_', n_name), CAST(n_regionkey AS INT), 'even'
  FROM nation WHERE n_nationkey % 2 = 0;
INSERT INTO TABLE g662_t PARTITION (r, par)
  SELECT 'appended', 9, 'odd' FROM region WHERE r_regionkey = 0;
SELECT r, par, COUNT(*) AS n,
       SUM(CASE WHEN v LIKE 'x\_%' THEN 1 ELSE 0 END) AS n_x
FROM g662_t GROUP BY r, par
