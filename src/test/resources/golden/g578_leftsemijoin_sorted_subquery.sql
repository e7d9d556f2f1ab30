-- leftsemijoin_mr.q: LEFT SEMI JOIN against a SORT BY subquery — the
-- semi must dedupe (duplicate probe keys in the right side must not
-- multiply left rows) and the subquery's sort is layout-only.
DROP TABLE IF EXISTS g578_t1;
DROP TABLE IF EXISTS g578_t2;
CREATE TABLE g578_t1 USING parquet AS
  SELECT CAST(n_nationkey % 6 AS INT) AS key FROM nation;
CREATE TABLE g578_t2 USING parquet AS
  SELECT CAST(n_nationkey % 3 AS INT) AS key FROM nation;
SELECT t1.key AS k, count(*) AS n
FROM g578_t1 t1 LEFT SEMI JOIN (SELECT key FROM g578_t2 SORT BY key) tmp
  ON (t1.key = tmp.key)
GROUP BY t1.key
