-- reference: ql/src/test/queries/clientpositive/parquet_decimal1.q —
-- ARRAY/MAP/STRUCT of DECIMAL(5,2) through a parquet round trip.
DROP TABLE IF EXISTS g1067_parq;
CREATE TABLE g1067_parq (
  arr ARRAY<DECIMAL(5,2)>,
  m MAP<STRING, DECIMAL(5,2)>,
  s STRUCT<i:INT, d:DECIMAL(5,2)>
) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1067_parq
  SELECT array(CAST(n_nationkey + 0.25 AS DECIMAL(5,2)),
               CAST(n_regionkey AS DECIMAL(5,2))),
         map(n_name, CAST(n_nationkey AS DECIMAL(5,2))),
         named_struct('i', CAST(n_nationkey AS INT),
                      'd', CAST(n_regionkey + 0.5 AS DECIMAL(5,2)))
  FROM nation;
SELECT arr[0] AS a0, arr[1] AS a1,
       map_keys(m)[0] AS mk, map_values(m)[0] AS mv,
       s.i AS si, s.d AS sd
FROM g1067_parq
