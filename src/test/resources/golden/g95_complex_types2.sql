WITH t AS (SELECT n_nationkey AS k, map('a', n_nationkey, 'b', n_regionkey) AS m,
                  array(n_regionkey, n_nationkey, 7) AS arr,
                  named_struct('x', n_name, 'y', n_regionkey) AS st
           FROM nation WHERE n_nationkey < 8)
SELECT k, sort_array(map_keys(m)) AS mk, sort_array(map_values(m)) AS mv,
  array_contains(arr, 7) AS has7, element_at(arr, 2) AS e2, slice(arr, 1, 2) AS sl,
  st.x AS sx, st.y AS sy
FROM t
