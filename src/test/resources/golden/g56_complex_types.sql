SELECT n_nationkey,
       named_struct('name', n_name, 'region', n_regionkey) AS st,
       map('key', n_nationkey, 'reg', n_regionkey)['reg'] AS reg,
       array(n_nationkey, n_regionkey)[0] AS first_el,
       sort_array(array(n_regionkey, n_nationkey)) AS sorted_arr
FROM nation WHERE n_nationkey < 6
