-- lateral_view_cp.q: column pruning through LATERAL VIEW over a join —
-- the count over the exploded column must not drop the array column
-- from the join's projection.
DROP TABLE IF EXISTS g861_av;
CREATE TABLE g861_av (key INT, value ARRAY<STRING>) USING parquet;
INSERT OVERWRITE TABLE g861_av SELECT n_nationkey, array(n_name) FROM nation;
SELECT count(val) AS n FROM
  (SELECT a.n_nationkey AS key, b.value AS array_val
   FROM nation a JOIN g861_av b ON a.n_nationkey = b.key) i
LATERAL VIEW explode(array_val) c AS val
