-- reference: ql/src/test/queries/clientpositive/parquet_map_of_maps.q —
-- MAP<STRING, MAP<STRING, INT>> written to parquet, copied via CTAS,
-- and read back through nested map accessors.
DROP TABLE IF EXISTS g1068_m;
DROP TABLE IF EXISTS g1068_copy;
CREATE TABLE g1068_m (map_of_maps MAP<STRING, MAP<STRING, INT>>)
  STORED AS PARQUET;
INSERT INTO g1068_m
  SELECT map(n_name, map('k', CAST(n_nationkey AS INT)))
  FROM nation WHERE n_nationkey < 5;
CREATE TABLE g1068_copy STORED AS PARQUET AS SELECT * FROM g1068_m;
SELECT map_keys(map_of_maps)[0] AS outer_key,
       map_values(map_values(map_of_maps)[0])[0] AS inner_val
FROM g1068_copy
