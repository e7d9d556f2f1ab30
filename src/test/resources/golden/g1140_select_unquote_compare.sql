-- reference: ql/src/test/queries/clientpositive/select_unquote_and.q
-- (+ _not, _or) — an UNQUOTED date-looking comparand (2012-11-31) is
-- integer arithmetic (2012-11-31 = 1970), so the partition compare
-- coerces and must not NPE; the quoted form selects normally.
DROP TABLE IF EXISTS g1140_npe;
CREATE TABLE g1140_npe (key STRING, value STRING)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1140_npe PARTITION (ds='2012-12-11')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey < 10;
INSERT OVERWRITE TABLE g1140_npe PARTITION (ds='2012-12-12')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey >= 10;
SELECT
  (SELECT count(*) FROM g1140_npe) AS total,
  (SELECT count(*) FROM g1140_npe
   WHERE ds > 2012-11-31 AND ds < 2012-12-15) AS unquoted_and,
  (SELECT count(*) FROM g1140_npe
   WHERE NOT (ds > 2012-11-31)) AS unquoted_not,
  (SELECT count(*) FROM g1140_npe
   WHERE ds > 2012-11-31 OR ds < 2012-12-15) AS unquoted_or,
  (SELECT count(*) FROM g1140_npe
   WHERE ds > '2012-12-11' AND ds < '2012-12-15') AS quoted
