-- decimal_join2.q: a self-join keyed on DECIMAL(38,18) — equality must
-- hold across the full scale, including values differing only far right
-- of the decimal point staying DISTINCT keys.
DROP TABLE IF EXISTS g822_dec;
CREATE TABLE g822_dec (key DECIMAL(38,18), value INT) USING parquet;
INSERT INTO g822_dec VALUES
  (cast('4.5' as decimal(38,18)), 1),
  (cast('4.500000000000000001' as decimal(38,18)), 2),
  (cast('-3.14' as decimal(38,18)), 3),
  (cast('-3.14' as decimal(38,18)), 4),
  (cast('0' as decimal(38,18)), 5),
  (NULL, 6);
SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g822_dec a JOIN g822_dec b ON (a.key = b.key)
