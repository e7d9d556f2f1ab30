-- multi_insert_lateral_view.q: FROM-first multi-insert whose branches
-- each carry their own LATERAL VIEW over the one shared scan (the
-- reference plans one TS feeding two LVF chains).
DROP TABLE IF EXISTS g334_a;
DROP TABLE IF EXISTS g334_b;
CREATE TABLE g334_a (k INT, c INT) USING parquet;
CREATE TABLE g334_b (k INT, c INT) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g334_a
  SELECT n_nationkey, C LATERAL VIEW explode(array(n_nationkey + 1, n_nationkey + 2)) A AS C
  WHERE n_nationkey < 3
INSERT OVERWRITE TABLE g334_b
  SELECT n_nationkey, C LATERAL VIEW explode(array(n_nationkey + 30, n_nationkey + 40)) A AS C
  WHERE n_nationkey < 2;
SELECT 'a' AS src, k, c FROM g334_a
UNION ALL
SELECT 'b' AS src, k, c FROM g334_b
ORDER BY src, k, c;
