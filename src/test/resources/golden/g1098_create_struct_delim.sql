-- reference: ql/src/test/queries/clientpositive/create_struct_table.q —
-- a STRUCT column on a DELIMITED text table (collection items on the
-- secondary delimiter), whole-struct and member reads.
DROP TABLE IF EXISTS g1098_abc;
CREATE TABLE g1098_abc (strct STRUCT<a:INT, b:STRING, c:STRING>)
ROW FORMAT DELIMITED
  FIELDS TERMINATED BY '\t'
  COLLECTION ITEMS TERMINATED BY '\001';
INSERT INTO g1098_abc
  SELECT named_struct('a', CAST(n_nationkey AS INT), 'b', n_name,
                      'c', concat('c_', n_regionkey))
  FROM nation WHERE n_nationkey < 6;
SELECT CAST(strct AS STRING) AS whole, strct.a AS a, strct.b AS b
FROM g1098_abc
