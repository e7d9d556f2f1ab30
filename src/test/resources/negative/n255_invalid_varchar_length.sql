-- reference: ql/src/test/queries/clientnegative/invalid_varchar_length_1.q
-- (and _3: zero). VARCHAR(n) is bounded to [1, 65535].
-- ERROR-CONTAINS: Varchar length 1000000 out of allowed range
DROP TABLE IF EXISTS neg_varchar_len;
CREATE TABLE neg_varchar_len (c1 VARCHAR(1000000)) USING parquet;
