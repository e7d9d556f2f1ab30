-- map construction/access/keys/values/size/contains
SELECT r_regionkey,
  m['a'] AS ma, m[r_name] AS self_miss,
  sort_array(map_keys(m)) AS ks, size(m) AS sz,
  array_contains(map_values(m), CAST(r_regionkey AS STRING)) AS hasval
FROM (SELECT r_regionkey, r_name,
        map('a', CAST(r_regionkey AS STRING), 'b', r_name) AS m FROM region) t
