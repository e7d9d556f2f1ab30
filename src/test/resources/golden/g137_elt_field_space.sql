SELECT n_nationkey, elt(1 + n_nationkey % 3, 'alpha', 'beta', 'gamma') AS e,
  concat(space(n_nationkey % 3), 'x') AS sp,
  repeat(substr(n_name, 1, 2), 2) AS rep,
  field(elt(1 + n_nationkey % 3, 'alpha', 'beta', 'gamma'), 'alpha', 'beta', 'gamma') AS f
FROM nation WHERE n_nationkey < 9
