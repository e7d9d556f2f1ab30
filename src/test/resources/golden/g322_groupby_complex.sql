-- groupby_complex_types.q: GROUP BY on array and struct values (the
-- reference groups on any Comparable ObjectInspector; Spark groups on
-- orderable complex types — arrays and structs, not maps).
SELECT arr, st, count(*) AS n FROM (
  SELECT array(n_regionkey, n_nationkey % 2) AS arr,
         named_struct('r', n_regionkey) AS st
  FROM nation
) t
GROUP BY arr, st
ORDER BY arr[0], arr[1];
