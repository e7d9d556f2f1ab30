-- ALTER TABLE SET SERDE / SET SERDEPROPERTIES on a native-format table:
-- accepted (no-op — the datasource provider already fixes the layout);
-- the script continues and data statements land.
DROP TABLE IF EXISTS g487_t;
CREATE TABLE g487_t (k INT, v STRING);
ALTER TABLE g487_t SET SERDEPROPERTIES ('field.delim' = ',');
ALTER TABLE g487_t SET SERDE 'org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe';
INSERT INTO g487_t VALUES (1,'a'), (2,'b');
SELECT k, v FROM g487_t
