-- reference: ql/src/test/queries/clientpositive/udf6.q — IF() across
-- boolean/NULL conditions and type pairs (string, decimal, bigint,
-- tinyint, smallint-vs-int widening).
SELECT IF(TRUE, 1, 2) AS i1, IF(FALSE, 1, 2) AS i2,
       IF(NULL, 1, 2) AS i3, IF(TRUE, 'a', 'b') AS i4,
       IF(TRUE, 0.1, 0.2) AS i5,
       IF(FALSE, CAST(1 AS BIGINT), CAST(2 AS BIGINT)) AS i6,
       IF(FALSE, CAST(127 AS TINYINT), CAST(126 AS TINYINT)) AS i7,
       IF(FALSE, CAST(127 AS SMALLINT), CAST(128 AS INT)) AS i8,
       CAST(128 AS INT) AS c1, CAST(1.0 AS DOUBLE) AS c2,
       CAST('128' AS STRING) AS c3
FROM nation TABLESAMPLE (1 ROWS)
