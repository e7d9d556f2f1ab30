-- date_4.q: the DATE literal keyword round-trips through a table column
-- and compares equal to itself inline.
DROP TABLE IF EXISTS g978_date4;
CREATE TABLE g978_date4 (d DATE) USING parquet;
INSERT OVERWRITE TABLE g978_date4
  SELECT date '2011-01-01' FROM nation LIMIT 1;
SELECT d, date '2011-01-01' AS lit, (d = date '2011-01-01') AS eq
FROM g978_date4 LIMIT 1
