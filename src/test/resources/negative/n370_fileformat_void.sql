-- reference: ql/src/test/queries/clientnegative/fileformat_void_input.q
-- (+ fileformat_void_output.q) — STORED AS INPUTFORMAT naming a class
-- that is not an input format (java.lang.Void) refuses.
-- ERROR-CONTAINS: Void | input format | not supported | cannot recognize
CREATE TABLE neg370_dest (key INT, value STRING) STORED AS
  INPUTFORMAT 'java.lang.Void'
  OUTPUTFORMAT 'org.apache.hadoop.hive.ql.io.IgnoreKeyTextOutputFormat';
