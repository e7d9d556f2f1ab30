-- reference: ql/src/test/queries/clientnegative/invalid_char_length_3.q
-- CHAR(0) is below the [1, 255] bound — refused.
-- ERROR-CONTAINS: Char length 0 out of allowed range
DROP TABLE IF EXISTS neg_char_len_3;
CREATE TABLE neg_char_len_3 (c1 CHAR(0)) USING parquet;
