-- reference: ql/src/test/queries/clientnegative/invalid_char_length_1.q
-- Hive bounds CHAR(n) to [1, 255] (BaseCharUtils); a DDL declaring a
-- wider column is refused at type construction.
-- ERROR-CONTAINS: Char length 1000000 out of allowed range
DROP TABLE IF EXISTS neg_char_len_1;
CREATE TABLE neg_char_len_1 (c1 CHAR(1000000)) USING parquet;
