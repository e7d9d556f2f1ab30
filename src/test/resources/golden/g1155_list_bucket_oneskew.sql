-- reference: ql/src/test/queries/clientpositive/
-- list_bucket_query_oneskew_1.q + list_bucket_query_oneskew_2.q +
-- list_bucket_query_oneskew_3.q (+ list_bucket_query_multiskew_2.q,
-- list_bucket_query_multiskew_3.q) — ONE skewed column with several
-- skew values: equality on a skewed value, on a non-skewed value, an
-- OR across both classes, and a join back over the skewed key.
DROP TABLE IF EXISTS g1155_lb;
CREATE TABLE g1155_lb (x STRING, y STRING)
  SKEWED BY (x) ON (('484'), ('51'), ('103'))
  STORED AS DIRECTORIES;
INSERT OVERWRITE TABLE g1155_lb
  SELECT CASE WHEN l_orderkey % 7 = 0 THEN '484'
              WHEN l_orderkey % 11 = 0 THEN '51'
              ELSE CAST(l_orderkey % 40 AS STRING) END,
         l_returnflag
  FROM lineitem WHERE l_orderkey < 800;
SELECT
  (SELECT count(*) FROM g1155_lb WHERE x = '484') AS skew484,
  (SELECT count(*) FROM g1155_lb WHERE x = '51') AS skew51,
  (SELECT count(*) FROM g1155_lb WHERE x = '7') AS plain7,
  (SELECT count(*) FROM g1155_lb WHERE x = '484' OR x = '7') AS or_mixed,
  (SELECT count(*) FROM g1155_lb a JOIN g1155_lb b ON a.x = b.x
   WHERE a.x = '51') AS self_join_skew
