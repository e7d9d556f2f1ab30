-- reference: ql/src/test/queries/clientpositive/varchar_serde.q +
-- varchar_1.q — VARCHAR through the text serde (the stem's regex/
-- lazybinary legs read LOAD files; the text and ORC hops are the
-- insert-capable equivalents) with a group/order probe after each hop.
DROP TABLE IF EXISTS g1188_txt;
DROP TABLE IF EXISTS g1188_orc;
CREATE TABLE g1188_txt (key VARCHAR(10), value VARCHAR(20))
  ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' STORED AS TEXTFILE;
INSERT INTO g1188_txt
  SELECT CAST(n_nationkey AS VARCHAR(10)),
         CAST(substr(n_name, 1, 8) AS VARCHAR(20))
  FROM nation;
CREATE TABLE g1188_orc STORED AS ORC AS SELECT * FROM g1188_txt;
SELECT t.value, count(*) AS n,
       (SELECT count(*) FROM g1188_orc) AS orc_n
FROM g1188_txt t GROUP BY t.value ORDER BY t.value LIMIT 5
