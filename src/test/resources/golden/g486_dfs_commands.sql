-- CliDriver dfs passthrough: stage a directory with dfs -mkdir/-rm -r,
-- write query output into it, dfs -mv it, then read it back through an
-- external table at the moved location.
dfs -rm -r /tmp/g486_stage;
dfs -rm -r /tmp/g486_final;
dfs -mkdir /tmp/g486_stage;
INSERT OVERWRITE DIRECTORY '/tmp/g486_stage/out' USING PARQUET
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 7;
dfs -mv /tmp/g486_stage/out /tmp/g486_final;
DROP TABLE IF EXISTS g486_ext;
CREATE EXTERNAL TABLE g486_ext (n_nationkey INT, n_name STRING)
STORED AS PARQUET LOCATION '/tmp/g486_final';
SELECT n_nationkey, n_name FROM g486_ext
