-- decimal_10_0.q: bare `decimal` defaults to DECIMAL(10,0) — fractional
-- inputs round to integers, overflowing inputs go NULL.
DROP TABLE IF EXISTS g851_dec;
CREATE TABLE g851_dec (dec DECIMAL) USING parquet;
INSERT INTO g851_dec SELECT cast('93.2' as decimal(10,0));
INSERT INTO g851_dec SELECT cast('3.02' as decimal(10,0));
INSERT INTO g851_dec SELECT cast('12345678901' as decimal(10,0));
SELECT dec FROM g851_dec
