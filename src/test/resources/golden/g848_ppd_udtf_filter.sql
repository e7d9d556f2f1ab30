-- ppd_udtf.q: a filter ABOVE an explode() must not push below the
-- generator into the pre-explode scan (the generated column doesn't
-- exist there); the pre-explode filter stays pushed.
SELECT value FROM (
  SELECT explode(array(n_nationkey, n_regionkey)) AS value FROM (
    SELECT * FROM nation WHERE n_nationkey > 15
  ) a
) b WHERE value < 18
