-- rcfile default-serde path: bare STORED AS RCFILE uses the reference's
-- hive.default.rcfile.serde (LazyBinaryColumnarSerDe, HiveConf.java:770)
-- — binary cells through the genuine serde class; typed round-trip incl.
-- decimal and date through the ObjectInspector bridge.
DROP TABLE IF EXISTS g688_rc;
CREATE TABLE g688_rc (
  k INT, name STRING, price DECIMAL(12,2), d DATE) STORED AS RCFILE;
INSERT OVERWRITE TABLE g688_rc
  SELECT n_nationkey, n_name,
         CAST(n_nationkey AS DECIMAL(12,2)) / 4,
         DATE_ADD(DATE'2024-01-01', CAST(n_nationkey AS INT))
  FROM nation;
SELECT k, name, price, d, year(d) AS y
FROM g688_rc WHERE price > 2 ORDER BY k
