-- char_udf1.q: string UDFs over CHAR columns — concat strips the pad,
-- upper preserves content, and each CHAR-side result equals its
-- STRING-side twin.
DROP TABLE IF EXISTS g829_cu;
CREATE TABLE g829_cu (c1 STRING, c2 STRING, c3 CHAR(10), c4 CHAR(20))
  USING parquet;
INSERT OVERWRITE TABLE g829_cu
  SELECT n_name, lower(n_name), n_name, lower(n_name) FROM nation
  WHERE n_nationkey = 3;
SELECT concat(c1, c2) AS s_cat, concat(c3, c4) AS c_cat,
       concat(c1, c2) = concat(c3, c4) AS cat_eq,
       upper(c2) AS s_up, upper(c4) AS c_up,
       upper(c2) = upper(c4) AS up_eq,
       length(c2) AS s_len, length(c4) AS c_len
FROM g829_cu
