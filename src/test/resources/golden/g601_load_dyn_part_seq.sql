-- load_dyn_part3.q over the native SEQUENCEFILE source: dynamic
-- partition INSERT into a graft-seq table routes rows into p=v dirs
-- (round-10 partitioned DSv2 layout) and a partition filter prunes.
DROP TABLE IF EXISTS g601_t;
CREATE TABLE g601_t (k INT, v STRING) USING `graft-seq` PARTITIONED BY (p INT);
INSERT OVERWRITE TABLE g601_t PARTITION (p)
  SELECT n_nationkey, n_name, CAST(n_regionkey AS INT) FROM nation;
SELECT p, COUNT(*) AS n, MIN(v) AS first_v FROM g601_t WHERE p >= 2 GROUP BY p
