WITH t AS (SELECT n_regionkey AS rk,
             map_from_entries(array(named_struct('key', 'k', 'value', n_nationkey), named_struct('key', 'r', 'value', n_regionkey))) AS m
           FROM nation WHERE n_nationkey < 5)
SELECT rk, m['k'] AS k, m['r'] AS r,
  map_concat(m, map('z', 99))['z'] AS z,
  size(map_filter(m, (k, v) -> v > 2)) AS nbig
FROM t
