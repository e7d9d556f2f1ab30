-- reference: ql/src/test/queries/clientpositive/type_conversions_1.q —
-- NULL casts to every primitive type stay NULL; unparseable
-- date/timestamp strings cast to NULL, not an error.
SELECT CAST(NULL AS TINYINT) AS t1, CAST(NULL AS SMALLINT) AS t2,
       CAST(NULL AS INT) AS t3, CAST(NULL AS BIGINT) AS t4,
       CAST(NULL AS FLOAT) AS t5, CAST(NULL AS DOUBLE) AS t6,
       CAST(NULL AS DECIMAL(10,0)) AS t7, CAST(NULL AS DATE) AS t8,
       CAST(NULL AS TIMESTAMP) AS t9, CAST(NULL AS STRING) AS t10,
       CAST(NULL AS VARCHAR(10)) AS t11, CAST(NULL AS BOOLEAN) AS t12,
       CAST(NULL AS BINARY) AS t13,
       CAST('abcd' AS DATE) AS bad_date,
       CAST('abcd' AS TIMESTAMP) AS bad_ts
FROM nation TABLESAMPLE (1 ROWS)
