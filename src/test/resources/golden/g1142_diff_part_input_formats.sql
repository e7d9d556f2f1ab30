-- reference: ql/src/test/queries/clientpositive/
-- diff_part_input_formats.q — a table switched from SEQUENCEFILE to
-- RCFILE leaves partitions in both formats; selecting a partition
-- that matches NEITHER still answers 0 rather than erroring.
DROP TABLE IF EXISTS g1142_part_test;
CREATE TABLE g1142_part_test (key STRING, value STRING)
  PARTITIONED BY (ds STRING) STORED AS SEQUENCEFILE;
ALTER TABLE g1142_part_test ADD PARTITION (ds='1');
ALTER TABLE g1142_part_test SET FILEFORMAT RCFILE;
ALTER TABLE g1142_part_test ADD PARTITION (ds='2');
SELECT count(1) AS n FROM g1142_part_test WHERE ds='3'
