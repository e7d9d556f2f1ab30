-- input14.q: TRANSFORM ... USING 'cat' inside a subquery with CLUSTER BY,
-- consumed by an outer filter — the script's text IO round-trips types
-- as strings.
SELECT tkey AS k, tvalue AS v
FROM (
  FROM nation
  SELECT TRANSFORM(n_nationkey, n_name) USING 'cat' AS (tkey, tvalue)
  CLUSTER BY tkey
) tmap
WHERE tmap.tkey < '15'
