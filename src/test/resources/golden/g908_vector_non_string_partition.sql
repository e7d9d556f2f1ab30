-- vector_non_string_partition.q: an INT (tinyint in the reference)
-- partition column through dynamic insert — partition values keep their
-- numeric type on read, SHOW PARTITIONS renders them, and pruning on
-- the numeric value works.
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g908_nsp;
CREATE TABLE g908_nsp (cstring STRING, cdouble DOUBLE)
  USING parquet PARTITIONED BY (cint INT);
INSERT OVERWRITE TABLE g908_nsp PARTITION (cint)
  SELECT n_name, n_nationkey * 1.5, n_regionkey FROM nation;
SELECT cint, count(*) AS n, min(cstring) AS mn
FROM g908_nsp WHERE cint >= 2 GROUP BY cint ORDER BY cint
