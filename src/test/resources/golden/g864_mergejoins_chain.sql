-- mergejoins.q: five tables joined on the SAME key column — consecutive
-- equi-joins on one key merge into a single shuffle stage; result
-- pinned with an outer leg mixed in.
DROP TABLE IF EXISTS g864_a;
DROP TABLE IF EXISTS g864_b;
DROP TABLE IF EXISTS g864_c;
CREATE TABLE g864_a (val1 INT, val2 INT) USING parquet;
CREATE TABLE g864_b (val1 INT, val2 INT) USING parquet;
CREATE TABLE g864_c (val1 INT, val2 INT) USING parquet;
INSERT INTO g864_a SELECT n_nationkey, n_regionkey FROM nation;
INSERT INTO g864_b SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey % 2 = 0;
INSERT INTO g864_c SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey % 3 = 0;
SELECT a.val1 AS k, b.val2 AS b2, c.val2 AS c2
FROM g864_a a
JOIN g864_b b ON a.val1 = b.val1
LEFT OUTER JOIN g864_c c ON a.val1 = c.val1
