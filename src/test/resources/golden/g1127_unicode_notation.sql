-- reference: ql/src/test/queries/clientpositive/unicode_notation.q
-- (HIVE-4618) — a field delimiter written as unicode  behaves
-- exactly like the octal \001 spelling and a literal '|': the same
-- data round-trips under all three.
DROP TABLE IF EXISTS g1127_u;
DROP TABLE IF EXISTS g1127_o;
DROP TABLE IF EXISTS g1127_p;
CREATE TABLE g1127_u (a STRING, b STRING)
  ROW FORMAT DELIMITED FIELDS TERMINATED BY '' STORED AS TEXTFILE;
CREATE TABLE g1127_o (a STRING, b STRING)
  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\001' STORED AS TEXTFILE;
CREATE TABLE g1127_p (a STRING, b STRING)
  ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' STORED AS TEXTFILE;
INSERT INTO g1127_u SELECT n_name, CAST(n_nationkey AS STRING)
  FROM nation WHERE n_nationkey < 4;
INSERT INTO g1127_o SELECT n_name, CAST(n_nationkey AS STRING)
  FROM nation WHERE n_nationkey < 4;
INSERT INTO g1127_p SELECT n_name, CAST(n_nationkey AS STRING)
  FROM nation WHERE n_nationkey < 4;
SELECT u.a, u.b, o.b AS ob, p.b AS pb
FROM g1127_u u JOIN g1127_o o ON u.a = o.a JOIN g1127_p p ON u.a = p.a
