-- cast1.q: arithmetic type widening through an INSERT (int+int stays
-- int, any decimal operand widens to double, boolean↔int casts).
DROP TABLE IF EXISTS g927_dest;
CREATE TABLE g927_dest (c1 INT, c2 DOUBLE, c3 DOUBLE, c4 DOUBLE, c5 INT,
  c6 BOOLEAN, c7 INT) USING parquet;
INSERT OVERWRITE TABLE g927_dest
SELECT 3 + 2, 3.0 + 2, 3 + 2.0, 3.0 + 2.0,
       3 + CAST(2.0 AS INT) + CAST(CAST(0 AS SMALLINT) AS INT),
       CAST(1 AS BOOLEAN), CAST(TRUE AS INT)
FROM nation WHERE n_nationkey = 7;
SELECT * FROM g927_dest
