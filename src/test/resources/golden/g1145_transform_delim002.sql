-- reference: ql/src/test/queries/clientpositive/input35.q (+ input36/
-- input38 shapes) — SELECT TRANSFORM with ROW FORMAT DELIMITED FIELDS
-- TERMINATED BY '\002' on BOTH sides of the script, landed in a table.
DROP TABLE IF EXISTS g1145_dest;
CREATE TABLE g1145_dest (key INT, value STRING) USING parquet;
FROM (
  FROM nation
  SELECT TRANSFORM(nation.n_nationkey, nation.n_name)
    ROW FORMAT DELIMITED FIELDS TERMINATED BY '\002'
  USING 'cat'
  AS (tkey, tvalue) ROW FORMAT DELIMITED FIELDS TERMINATED BY '\002'
) tmap
INSERT OVERWRITE TABLE g1145_dest SELECT CAST(tkey AS INT), tvalue;
SELECT count(*) AS n, sum(key) AS sk, min(value) AS mn FROM g1145_dest
