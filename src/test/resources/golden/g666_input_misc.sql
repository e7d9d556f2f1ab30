-- input17.q, input18.q, input1_limit.q, input_part2.q, insert1.q:
-- TRANSFORM-with-limit inserts, two destinations with different limits,
-- partitioned input selects, INSERT INTO a just-created table twice.
DROP TABLE IF EXISTS g666_d1;
DROP TABLE IF EXISTS g666_d2;
CREATE TABLE g666_d1 (k INT, v STRING) USING parquet;
CREATE TABLE g666_d2 (k INT) USING parquet;
FROM (SELECT * FROM nation ORDER BY n_nationkey LIMIT 10) src
INSERT OVERWRITE TABLE g666_d1 SELECT n_nationkey, n_name WHERE n_nationkey < 5
INSERT OVERWRITE TABLE g666_d2 SELECT n_nationkey WHERE n_nationkey >= 5;
INSERT INTO g666_d2 SELECT k FROM g666_d2;
SELECT 'd1' AS tag, COUNT(*) AS n, SUM(k) AS s FROM g666_d1
UNION ALL
SELECT 'd2_doubled', COUNT(*), SUM(k) FROM g666_d2
UNION ALL
SELECT 'transformed', COUNT(*), SUM(CAST(tk AS INT)) FROM
  (SELECT TRANSFORM(n_nationkey) USING 'cat' AS (tk)
   FROM (SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 7) q) tr
