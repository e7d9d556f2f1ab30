-- script_pipe.q: scripts that do not consume all their input. 'true'
-- reads nothing and exits 0 (ScriptOperator.close must not fail on the
-- broken pipe); 'head -n 2' stops mid-stream (processOp must survive the
-- SIGPIPE). The ORDER BY LIMIT subquery pins a single deterministic
-- input partition.
SELECT count(*) AS none_out FROM (
  SELECT TRANSFORM(n_nationkey, n_name) USING 'true' AS (a STRING, b STRING)
  FROM (SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 5) t
) u;
SELECT TRANSFORM(n_nationkey, n_name) USING 'head -n 2' AS (k STRING, name STRING)
FROM (SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 5) t;
