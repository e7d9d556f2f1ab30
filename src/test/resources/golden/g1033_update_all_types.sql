-- reference: ql/src/test/queries/clientpositive/update_all_types.q — an
-- ACID UPDATE that sets EVERY column type in one statement (int family,
-- float/double, decimal, string family, date/timestamp, boolean), some
-- from expressions over other columns, then reads the whole table back.
DROP TABLE IF EXISTS g1033_acid;
CREATE TABLE g1033_acid (
  ti TINYINT, si SMALLINT, i INT, bi BIGINT,
  f FLOAT, d DOUBLE, de DECIMAL(10,3),
  s STRING, vc VARCHAR(10), ch CHAR(3),
  dt DATE, ts TIMESTAMP, b BOOLEAN) USING parquet;
INSERT INTO g1033_acid VALUES
  (1, 10, 100, 1000, 1.5, 2.25, 3.125, 'one', 'vone', 'aa',
   DATE '2014-09-01', TIMESTAMP '2014-09-01 09:44:23.8', true),
  (2, 20, 200, 2000, 2.5, 4.25, 6.125, 'two', 'vtwo', 'bb',
   DATE '2014-09-02', TIMESTAMP '2014-09-02 09:44:23.8', false);
UPDATE g1033_acid SET
  ti = ti + 1, si = cast(f AS INT), i = 747, bi = bi * 2,
  f = cast(i AS FLOAT), d = d / 2, de = 1234.567,
  s = 'updated', vc = 'new vc', ch = 'zz',
  dt = DATE '2016-06-08', ts = TIMESTAMP '2016-06-08 00:00:00', b = NOT b
WHERE i = 100;
SELECT * FROM g1033_acid;
