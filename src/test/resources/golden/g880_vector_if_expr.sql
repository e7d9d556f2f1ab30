-- vector_if_expr.q: IF over a boolean column, including the NOT side
-- and NULL boolean propagation (IF(NULL,..) takes the else branch).
DROP TABLE IF EXISTS g880_b;
CREATE TABLE g880_b (id INT, cboolean1 BOOLEAN) USING parquet;
INSERT INTO g880_b VALUES (1, true), (2, false), (3, NULL), (4, true);
SELECT id, cboolean1,
       IF(cboolean1, 'first', 'second') AS pick,
       IF(NOT cboolean1, 'yes', 'no') AS inverted
FROM g880_b ORDER BY id
