-- skewjoinopt1.q/skewjoinopt11.q representatives: a join whose key
-- distribution is skewed (one heavy key) — the skew-handled plan must
-- produce identical results, including the heavy key's full fan-out.
DROP TABLE IF EXISTS g614_s;
CREATE TABLE g614_s USING parquet AS
  SELECT CASE WHEN l_linenumber > 2 THEN 1 ELSE l_orderkey % 97 END AS k,
         l_quantity AS q
  FROM lineitem WHERE l_orderkey < 2000;
SELECT a.k AS k, COUNT(*) AS n_pairs, ROUND(SUM(a.q + b.q)) AS s
FROM g614_s a JOIN g614_s b ON a.k = b.k
WHERE a.k < 5
GROUP BY a.k
