-- nullinput2.q: scans and aggregates over a PARTITIONED table filtered
-- to a partition that does not exist — zero rows for the scan, a zero
-- count for the aggregate.
DROP TABLE IF EXISTS g813_nulltbl;
CREATE TABLE g813_nulltbl (key INT)
  USING parquet PARTITIONED BY (ds STRING);
SELECT count(1) AS n,
       (SELECT count(*) FROM g813_nulltbl WHERE ds = '101') AS n2
FROM g813_nulltbl WHERE ds = '101'
