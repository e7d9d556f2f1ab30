-- cte_in_dml shape: WITH clauses feeding an INSERT, one CTE referencing
-- another.
DROP TABLE IF EXISTS g515_t;
CREATE TABLE g515_t (rk INT, n BIGINT);
WITH big AS (
  SELECT n_regionkey, n_nationkey FROM nation WHERE n_nationkey >= 5
),
agg AS (
  SELECT n_regionkey AS rk, count(1) AS n FROM big GROUP BY n_regionkey
)
INSERT INTO g515_t SELECT rk, n FROM agg WHERE n > 1;
SELECT rk, n FROM g515_t
