-- reference: ql/src/test/queries/clientpositive/date_serde.q — DATE
-- round trip through serde-distinct storage (text serde, ORC, parquet;
-- the reference additionally runs regex/lazybinary legs over LOAD DATA
-- files) with a per-date aggregate after each hop.
DROP TABLE IF EXISTS g1076_txt;
DROP TABLE IF EXISTS g1076_orc;
DROP TABLE IF EXISTS g1076_parq;
CREATE TABLE g1076_txt (fl_date DATE, fl_num INT) STORED AS TEXTFILE;
INSERT OVERWRITE TABLE g1076_txt
  SELECT CAST(date_add('2010-10-20', CAST(n_regionkey AS INT)) AS DATE),
         CAST(n_nationkey AS INT)
  FROM nation;
CREATE TABLE g1076_orc STORED AS ORC AS SELECT * FROM g1076_txt;
CREATE TABLE g1076_parq STORED AS PARQUET AS SELECT * FROM g1076_orc;
SELECT p.fl_date, count(*) AS cnt, sum(p.fl_num) AS s,
       min(t.fl_num) AS mn
FROM g1076_parq p JOIN g1076_txt t
  ON p.fl_date = t.fl_date AND p.fl_num = t.fl_num
GROUP BY p.fl_date
