-- array of structs: build, explode, field access, aggregate
SELECT st, sum(sz) AS total FROM (
  SELECT ex.s AS st, ex.n AS sz FROM (
    SELECT explode(arr) AS ex FROM (
      SELECT array(named_struct('s', o_orderstatus, 'n', 1),
                   named_struct('s', o_orderpriority, 'n', 2)) AS arr
      FROM orders WHERE o_orderkey <= 100) a) b) c
GROUP BY st
