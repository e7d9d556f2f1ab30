SELECT n_regionkey, sort_array(collect_list(n_nationkey)) AS ids,
  array_join(sort_array(collect_set(substr(n_name, 1, 1))), ',') AS initials
FROM nation GROUP BY n_regionkey
