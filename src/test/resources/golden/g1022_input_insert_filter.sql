-- reference: ql/src/test/queries/clientpositive/input0.q (SELECT * full
-- scan) + input11.q (FROM src INSERT OVERWRITE TABLE dest SELECT ...
-- WHERE filter, then SELECT dest.*): the basic FROM-first single-insert
-- with a pushed filter.
DROP TABLE IF EXISTS g1022_dest1;
CREATE TABLE g1022_dest1 (key INT, value STRING) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g1022_dest1 SELECT nation.n_nationkey, nation.n_name WHERE nation.n_nationkey < 10;
SELECT g1022_dest1.* FROM g1022_dest1;
