-- orc_null_check.q: an array column holding array(NULL) survives the
-- ORC round trip — size() sees one element, the element is NULL.
DROP TABLE IF EXISTS g990_lt;
CREATE TABLE g990_lt (l ARRAY<STRING>) STORED AS ORC;
INSERT OVERWRITE TABLE g990_lt
  SELECT array(CAST(NULL AS STRING)) FROM nation WHERE n_nationkey < 4;
SELECT size(l) AS sz, (l[0] IS NULL) AS first_null FROM g990_lt
