-- reference: ql/src/test/queries/clientpositive/rcfile_null_value.q (+
-- rcfile_union.q) — NULLs through an RCFile insert fed by a RIGHT
-- OUTER join (null-extended left side), and a union re-read.
DROP TABLE IF EXISTS g1115_dest;
CREATE TABLE g1115_dest (c1 INT, c2 STRING, c3 INT, c4 STRING)
  STORED AS RCFILE;
INSERT OVERWRITE TABLE g1115_dest
  SELECT a.c1, a.c2, b.c3, b.c4 FROM
    (SELECT CAST(n_nationkey AS INT) AS c1, n_name AS c2 FROM nation
     WHERE n_nationkey > 10 AND n_nationkey < 20) a
  RIGHT OUTER JOIN
    (SELECT CAST(n_nationkey AS INT) AS c3, n_name AS c4 FROM nation
     WHERE n_nationkey > 15 AND n_nationkey < 25) b
  ON a.c1 = b.c3;
SELECT 'rows' AS tag, c1, c2, c3, c4 FROM g1115_dest
UNION ALL
SELECT 'nulls', CAST(count(*) AS INT) - CAST(count(c1) AS INT),
       CAST(count(*) AS STRING), NULL, NULL
FROM g1115_dest
