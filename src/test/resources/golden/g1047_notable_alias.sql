-- reference: ql/src/test/queries/clientpositive/notable_alias1.q +
-- notable_alias2.q — mixing UNALIASED and table-qualified references to
-- the same column across SELECT / WHERE / GROUP BY, with a constant
-- first output column.
DROP TABLE IF EXISTS g1047_dest;
CREATE TABLE g1047_dest (dummy STRING, key INT, value DOUBLE) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g1047_dest
  SELECT '1234', n_nationkey, count(1) WHERE nation.n_nationkey < 10 GROUP BY n_nationkey;
FROM nation
INSERT INTO TABLE g1047_dest
  SELECT '5678', nation.n_nationkey, count(1) WHERE n_nationkey >= 20 GROUP BY nation.n_nationkey;
SELECT g1047_dest.* FROM g1047_dest;
