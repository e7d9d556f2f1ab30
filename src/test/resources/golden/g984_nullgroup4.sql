-- nullgroup4.q: global aggregates over an EMPTY (fully filtered) input
-- — count(1) and count(distinct) both return 0, one row, never zero
-- rows (the no-GROUP-BY global aggregate contract).
DROP TABLE IF EXISTS g984_src;
CREATE TABLE g984_src USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value FROM nation;
SELECT count(1) AS c1, count(DISTINCT x.value) AS cd
FROM g984_src x WHERE x.key = '9999'
