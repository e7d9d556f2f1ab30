-- reference: ql/src/test/queries/clientpositive/input14_limit.q —
-- TRANSFORM ... USING 'cat' with CLUSTER BY + LIMIT inside the FROM
-- subquery, filtered insert outside. The limit here is non-selective
-- (30 > 25 nations) so the pinned rows don't depend on which reducer's
-- rows a selective post-CLUSTER-BY limit would keep.
DROP TABLE IF EXISTS g1023_dest1;
CREATE TABLE g1023_dest1 (key INT, value STRING) USING parquet;
FROM (
  FROM nation
  SELECT TRANSFORM(nation.n_nationkey, nation.n_name)
         USING 'cat' AS (tkey, tvalue)
  CLUSTER BY tkey LIMIT 30
) tmap
INSERT OVERWRITE TABLE g1023_dest1 SELECT tmap.tkey, tmap.tvalue WHERE tmap.tkey < 12;
SELECT g1023_dest1.* FROM g1023_dest1;
