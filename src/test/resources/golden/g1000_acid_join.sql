-- acid_join.q: transactional bucketed tables with DIFFERENT bucket
-- counts (2/4/8) joined and inserted into each other — per-table bucket
-- info must not leak across the join; plus an UPDATE through the CoW
-- path before the final read.
DROP TABLE IF EXISTS g1000_a1;
DROP TABLE IF EXISTS g1000_a2;
DROP TABLE IF EXISTS g1000_a3;
CREATE TABLE g1000_a1 (name VARCHAR(50), age INT)
  CLUSTERED BY (age) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
CREATE TABLE g1000_a2 (name VARCHAR(50), gpa DECIMAL(3,2))
  CLUSTERED BY (gpa) INTO 4 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
CREATE TABLE g1000_a3 (name VARCHAR(50), age INT, gpa DECIMAL(3,2))
  CLUSTERED BY (gpa) INTO 8 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1000_a1 VALUES
  ('aaa', 35), ('bbb', 32), ('ccc', 32), ('ddd', 35), ('eee', 32);
INSERT INTO g1000_a2 VALUES
  ('aaa', 3.00), ('bbb', 3.01), ('ccc', 3.02), ('ddd', 3.03), ('eee', 3.04);
INSERT INTO g1000_a3
  SELECT a.name, age, gpa FROM g1000_a1 a JOIN g1000_a2 b ON (a.name = b.name);
UPDATE g1000_a3 SET age = 33 WHERE name = 'eee';
SELECT name, age, gpa FROM g1000_a3 ORDER BY name
