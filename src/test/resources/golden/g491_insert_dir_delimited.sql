-- insert_overwrite_dir (classic text export): INSERT OVERWRITE DIRECTORY
-- with ROW FORMAT DELIMITED writes delimiter-separated text files; read
-- back raw with dfs -cat (directory expands to its data files).
dfs -rm -r /tmp/g491_out;
INSERT OVERWRITE DIRECTORY '/tmp/g491_out'
ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 3;
dfs -cat /tmp/g491_out
