-- insert_compressed.q: INSERT into a default-text table with
-- hive.exec.compress.output=true — FileSinkOperator wraps the text
-- stream in the session codec (deflate by default); appends accumulate
-- compressed and plain files side by side and read back as one table.
set hive.exec.compress.output=true;
DROP TABLE IF EXISTS g697_comp;
CREATE TABLE g697_comp (key INT, value STRING);
INSERT OVERWRITE TABLE g697_comp
  SELECT n_nationkey, concat('val_', n_nationkey) FROM nation;
INSERT INTO TABLE g697_comp
  SELECT n_nationkey, concat('val_', n_nationkey) FROM nation;
set hive.exec.compress.output=false;
INSERT INTO TABLE g697_comp
  SELECT n_nationkey, concat('val_', n_nationkey) FROM nation;
SELECT count(*) AS n, sum(key) AS s, min(value) AS mn, max(value) AS mx
FROM g697_comp;
