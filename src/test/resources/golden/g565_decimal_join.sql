-- decimal_join.q / decimal_join2.q: equi-join on DECIMAL keys of
-- DIFFERENT precision/scale — the join must coerce to the wider type and
-- match on numeric value, not rendered text (1.00 joins 1.0).
DROP TABLE IF EXISTS g565_a;
DROP TABLE IF EXISTS g565_b;
CREATE TABLE g565_a (k DECIMAL(10,2), v STRING) USING parquet;
CREATE TABLE g565_b (k DECIMAL(12,4), v STRING) USING parquet;
INSERT INTO g565_a VALUES (1.0, 'a1'), (2.50, 'a2'), (3.141, 'a3'), (NULL, 'an');
INSERT INTO g565_b VALUES (1.0000, 'b1'), (2.5, 'b2'), (3.1410, 'b3'), (NULL, 'bn');
SELECT a.v AS av, b.v AS bv, CAST(a.k AS STRING) AS ak, CAST(b.k AS STRING) AS bk
FROM g565_a a JOIN g565_b b ON a.k = b.k
