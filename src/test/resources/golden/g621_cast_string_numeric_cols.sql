-- implicit_cast1.q follow-on for the round-10 CompareViaDouble rule over
-- real COLUMNS (not literals): string keys built from numerics compare
-- via double in joins and filters.
DROP TABLE IF EXISTS g621_s;
CREATE TABLE g621_s USING parquet AS
  SELECT CASE WHEN n_nationkey = 5 THEN '5e0'
              WHEN n_nationkey = 7 THEN '07.0'
              ELSE CAST(n_nationkey AS STRING) END AS sk, n_name
  FROM nation;
SELECT 'filter_sci' AS tag, COUNT(*) AS n FROM g621_s WHERE sk = 5
UNION ALL
SELECT 'filter_pad', COUNT(*) FROM g621_s WHERE sk = 7
UNION ALL
SELECT 'join_via_double', COUNT(*) FROM g621_s a JOIN nation b ON a.sk = b.n_nationkey
