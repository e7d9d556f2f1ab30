-- reference: ql/src/test/queries/clientnegative/delete_non_acid_table.q
-- DML on a thrift-serialized table is refused loudly (non-ACID parity)
-- ERROR-CONTAINS: refuse | not supported | cannot | unsupported
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_thr;
CREATE TABLE graft_tmp.neg_thr
ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.thrift.ThriftDeserializer'
WITH SERDEPROPERTIES (
  'serialization.class' = 'org.apache.hadoop.hive.serde2.thrift.test.IntString',
  'serialization.format' = 'org.apache.thrift.protocol.TBinaryProtocol')
STORED AS SEQUENCEFILE
LOCATION '${NEGTMP}/neg_thr/t';
DELETE FROM graft_tmp.neg_thr WHERE myint = 1;
