-- groupby_map_ppr.q: map-side aggregation under PARTITION PRUNING — a
-- distinct+sum aggregate over only the matching partition of a
-- partitioned table.
DROP TABLE IF EXISTS g865_srcpart;
CREATE TABLE g865_srcpart (key INT, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT INTO g865_srcpart PARTITION (ds='2008-04-08')
  SELECT n_nationkey, n_name FROM nation;
INSERT INTO g865_srcpart PARTITION (ds='2008-04-09')
  SELECT n_nationkey + 100, n_name FROM nation;
SELECT substr(value, 8, 1) AS k, count(DISTINCT key % 7) AS c1,
       concat(substr(value, 8, 1), sum(key)) AS c2
FROM g865_srcpart
WHERE ds = '2008-04-08'
GROUP BY substr(value, 8, 1)
