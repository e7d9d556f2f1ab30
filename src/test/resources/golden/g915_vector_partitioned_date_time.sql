-- vector_partitioned_date_time.q: a DATE partition column via dynamic
-- insert — values round-trip as dates, prune on equality, and
-- date functions apply to the partition column.
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g915_pdt;
CREATE TABLE g915_pdt (k INT, ts TIMESTAMP)
  USING parquet PARTITIONED BY (fl_date DATE);
INSERT OVERWRITE TABLE g915_pdt PARTITION (fl_date)
  SELECT CAST(n_nationkey AS INT),
         TIMESTAMP '2010-10-20 07:30:00',
         DATE_ADD(DATE '2010-10-20', CAST(n_regionkey AS INT))
  FROM nation;
SELECT fl_date, year(fl_date) AS y, day(fl_date) AS d, count(*) AS n
FROM g915_pdt WHERE fl_date = DATE '2010-10-22'
GROUP BY fl_date
