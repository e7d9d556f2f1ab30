-- str_to_map feeding a LATERAL VIEW explode of the map — kv-string
-- parsing into rows.
SELECT k, mk, mv FROM (
  SELECT n_nationkey AS k,
         str_to_map(concat('name:', n_name, ',region:', cast(n_regionkey AS STRING)), ',', ':') AS m
  FROM nation WHERE n_nationkey < 4
) t
LATERAL VIEW explode(m) e AS mk, mv
