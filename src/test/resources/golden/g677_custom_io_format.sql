-- custom_input_output_format.q + create_merge_compressed.q: CREATE with
-- the explicit STORED AS INPUTFORMAT/OUTPUTFORMAT class pair (mapped to
-- the native source for the standard Hive IO classes), write + read
-- round trip; the graft-seq writer emits its usual container, so a
-- CONCATENATE-style rewrite keeps answers (compact path).
DROP TABLE IF EXISTS g677_t;
CREATE TABLE g677_t (k INT, v STRING)
STORED AS INPUTFORMAT 'org.apache.hadoop.mapred.SequenceFileInputFormat'
OUTPUTFORMAT 'org.apache.hadoop.hive.ql.io.HiveSequenceFileOutputFormat';
INSERT INTO g677_t SELECT n_nationkey, n_name FROM nation;
INSERT INTO g677_t SELECT r_regionkey + 100, r_name FROM region;
ALTER TABLE g677_t CONCATENATE;
SELECT COUNT(*) AS n, SUM(k) AS s, MIN(v) AS mn FROM g677_t
