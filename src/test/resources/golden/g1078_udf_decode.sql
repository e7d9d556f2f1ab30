-- reference: ql/src/test/queries/clientpositive/udf_decode.q — the
-- charset form of decode(): binary operand, charset as plain string /
-- varchar-cast / char-cast, and a NULL binary.
SELECT
  decode(binary('TestDecode1'), 'UTF-8') AS d1,
  decode(binary('TestDecode2'), CAST('UTF-8' AS VARCHAR(10))) AS d2,
  decode(binary('TestDecode3'), CAST('UTF-8' AS CHAR(5))) AS d3,
  decode(CAST(NULL AS BINARY), 'UTF-8') AS d4,
  decode(encode('round trip', 'UTF-8'), 'UTF-8') AS d5
FROM nation TABLESAMPLE (1 ROWS)
