-- union_remove_6_subq.q: union of two aggregate branches through a
-- subquery, multi-inserted into TWO tables, read back together
DROP TABLE IF EXISTS g396_o1;
DROP TABLE IF EXISTS g396_o2;
CREATE TABLE g396_o1 (seg STRING, n BIGINT) USING parquet;
CREATE TABLE g396_o2 (seg STRING, n BIGINT) USING parquet;
FROM (
  SELECT * FROM (
    SELECT c_mktsegment AS seg, count(1) AS n FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment AS seg, count(1) AS n FROM customer GROUP BY c_mktsegment
  ) subq
) a
INSERT OVERWRITE TABLE g396_o1 SELECT *
INSERT OVERWRITE TABLE g396_o2 SELECT *;
SELECT 'o1' AS src, seg, n FROM g396_o1
UNION ALL
SELECT 'o2' AS src, seg, n FROM g396_o2;
