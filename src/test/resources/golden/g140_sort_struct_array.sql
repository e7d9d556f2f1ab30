SELECT n_regionkey,
  sort_array(collect_list(named_struct('bal', n_nationkey, 'name', n_name))) AS members
FROM nation WHERE n_nationkey < 12
GROUP BY n_regionkey
