-- rcfile_lazydecompress.q: filtered and aggregated reads over an
-- RCFile table written with output compression on — the columnar
-- reader decompresses only projected column buffers (lazy
-- decompression, the point of the format).
set mapred.output.compress=true;
set hive.exec.compress.output=true;
DROP TABLE IF EXISTS g698_rclazy;
CREATE TABLE g698_rclazy (key STRING, value STRING) STORED AS RCFile;
INSERT OVERWRITE TABLE g698_rclazy
  SELECT CAST(n_nationkey * 20 AS STRING), concat('val_', n_nationkey)
  FROM nation;
set mapred.output.compress=false;
set hive.exec.compress.output=false;
-- string-vs-int comparisons route via double (Hive comparison rule),
-- so key > 238 filters numerically over the string column
SELECT g1.key, g1.value, g2.cnt
FROM g698_rclazy g1
JOIN (SELECT key, count(1) AS cnt FROM g698_rclazy
      WHERE key > 238 GROUP BY key) g2 ON g1.key = g2.key
WHERE g1.key > 238 AND g1.key < 400
ORDER BY g1.key ASC, g1.value ASC
