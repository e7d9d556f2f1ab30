-- mapjoin_filter_on_outerjoin.q: RIGHT OUTER with per-side FILTERS inside
-- ON (src1.key < 10 AND src2.key > 10 — contradictory, so no row ever
-- matches and every src2 row survives null-extended), then an inner hop
-- with its own ON filter; once bare, once with the MAPJOIN hint — results
-- must be identical.
DROP TABLE IF EXISTS g559_src1;
DROP TABLE IF EXISTS g559_src;
CREATE TABLE g559_src1 USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation WHERE n_nationkey % 3 = 0;
CREATE TABLE g559_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
SELECT 'plain' AS tag, src1.key AS k1, src2.key AS k2, src3.key AS k3
FROM g559_src1 src1
RIGHT OUTER JOIN g559_src1 src2 ON (src1.key = src2.key AND src1.key < 10 AND src2.key > 10)
JOIN g559_src src3 ON (src2.key = src3.key AND src3.key < 300)
UNION ALL
SELECT /*+ mapjoin(src1, src2) */ 'hinted', src1.key, src2.key, src3.key
FROM g559_src1 src1
RIGHT OUTER JOIN g559_src1 src2 ON (src1.key = src2.key AND src1.key < 10 AND src2.key > 10)
JOIN g559_src src3 ON (src2.key = src3.key AND src3.key < 300)
