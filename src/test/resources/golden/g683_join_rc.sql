-- join_rc.q: equi-join where BOTH sides are stored on the RCFile
-- columnar container (graft-rcfile, the genuine hive-exec RCFile
-- classes); src-style key/value fixtures from nation.
DROP TABLE IF EXISTS g683_rc1;
DROP TABLE IF EXISTS g683_rc2;
CREATE TABLE g683_rc1 (key STRING, value STRING) STORED AS RCFILE;
CREATE TABLE g683_rc2 (key STRING, value STRING) STORED AS RCFILE;
INSERT OVERWRITE TABLE g683_rc1
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey) FROM nation;
INSERT OVERWRITE TABLE g683_rc2
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey) FROM nation;
SELECT g683_rc1.key, g683_rc2.value
FROM g683_rc1 JOIN g683_rc2 ON g683_rc1.key = g683_rc2.key
