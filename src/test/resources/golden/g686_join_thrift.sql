-- join_thrift.q: self-join of a thrift-serialized sequencefile table
-- (the src_thrift fixture shape — ThriftDeserializer serde; the Complex
-- class IS the schema, the DDL carries no column list). A thrift UNION
-- field maps to a struct of its alternatives (Hive: uniontype<...> —
-- same information, Catalyst-native shape).
DROP TABLE IF EXISTS g686_src_thrift;
CREATE TABLE g686_src_thrift
ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.thrift.ThriftDeserializer'
WITH SERDEPROPERTIES (
  'serialization.class' = 'org.apache.hadoop.hive.serde2.thrift.test.Complex',
  'serialization.format' = 'org.apache.thrift.protocol.TBinaryProtocol')
STORED AS SEQUENCEFILE;
INSERT INTO g686_src_thrift
SELECT CAST(n_nationkey AS INT),
       concat('record_', n_nationkey),
       array(CAST(n_nationkey AS INT), CAST(n_regionkey AS INT)),
       array(n_name),
       array(named_struct(
         'myint', CAST(n_nationkey * 2 AS INT),
         'myString', concat('s', n_name),
         'underscore_int', CAST(n_nationkey + 1 AS INT))),
       map('key', n_name),
       NULL, NULL, NULL, NULL
FROM nation WHERE n_nationkey < 8;
SELECT s1.aint, s2.lintString
FROM g686_src_thrift s1
JOIN g686_src_thrift s2
ON s1.aint = s2.aint
