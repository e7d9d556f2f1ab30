-- permissive cast edges: bad strings -> NULL, truncation toward zero, bool
-- casts. string->boolean is Hive's non-empty-is-true
-- (PrimitiveObjectInspectorUtils.java:502, HiveSemantics.StringBooleanCast
-- round 10): '0' -> TRUE, '' -> FALSE.
SELECT CAST('12abc' AS INT) AS bad_int, CAST('  42 ' AS INT) AS pad_int,
       CAST('3.9' AS INT) AS dec_str_int, CAST(-3.9 AS INT) AS neg_trunc,
       CAST('true' AS BOOLEAN) AS b1, CAST('0' AS BOOLEAN) AS b0,
       CAST(CAST('1969-12-31 23:59:59' AS TIMESTAMP) AS BIGINT) AS neg_epoch,
       CAST('' AS INT) AS empty_int,
       CAST('' AS BOOLEAN) AS bempty, CAST('false' AS BOOLEAN) AS bfalse
FROM region WHERE r_regionkey = 0
