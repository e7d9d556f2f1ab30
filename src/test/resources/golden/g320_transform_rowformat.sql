-- transform with explicit input ROW FORMAT DELIMITED (ScriptOperator +
-- LazySimpleSerDe, non-default delimiter): the script's stdin arrives
-- '|'-separated — sed rewrites the delimiter to ':' proving it applied;
-- the single-column AS keeps stdout parsing delimiter-independent.
SELECT TRANSFORM(n_nationkey, n_name)
  ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
  USING 'sed "s/|/:/g"'
  AS (line STRING)
FROM (SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 4) t;
