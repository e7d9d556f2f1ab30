-- union6.q: INSERT OVERWRITE of a union mixing a single-row aggregate
-- branch with a raw-table branch (including src1-style blank keys),
-- run twice (overwrite idempotence), sorted readback.
DROP TABLE IF EXISTS g787_src1;
DROP TABLE IF EXISTS g787_tmp;
CREATE TABLE g787_src1 (key STRING, value STRING);
INSERT INTO g787_src1 VALUES ('', ''), ('', 'val_x'), ('128', ''), ('224', 'val_224'), (NULL, 'v');
CREATE TABLE g787_tmp (key STRING, value STRING);
INSERT OVERWRITE TABLE g787_tmp
SELECT unionsrc.key, unionsrc.value FROM (
  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value FROM nation s1
  UNION ALL
  SELECT s2.key AS key, s2.value AS value FROM g787_src1 s2) unionsrc;
INSERT OVERWRITE TABLE g787_tmp
SELECT unionsrc.key, unionsrc.value FROM (
  SELECT 'tst1' AS key, CAST(count(1) AS STRING) AS value FROM nation s1
  UNION ALL
  SELECT s2.key AS key, s2.value AS value FROM g787_src1 s2) unionsrc;
SELECT key, value FROM g787_tmp
