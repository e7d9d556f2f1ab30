-- reference: ql/src/test/queries/clientpositive/unset_table_view_property.q
-- — ALTER TABLE SET then UNSET TBLPROPERTIES: subsets, repeats, and
-- IF EXISTS over missing keys; the surviving property is read back by
-- key.
DROP TABLE IF EXISTS g1120_t;
CREATE TABLE g1120_t (col1 INT, col2 INT) USING parquet;
ALTER TABLE g1120_t SET TBLPROPERTIES ('a'='1', 'c'='3');
ALTER TABLE g1120_t UNSET TBLPROPERTIES ('a', 'c');
ALTER TABLE g1120_t SET TBLPROPERTIES ('a'='1', 'c'='3', 'd'='4');
ALTER TABLE g1120_t UNSET TBLPROPERTIES ('a', 'd');
ALTER TABLE g1120_t UNSET TBLPROPERTIES IF EXISTS ('nosuch', 'c', 'c');
ALTER TABLE g1120_t SET TBLPROPERTIES ('b'='kept');
SHOW TBLPROPERTIES g1120_t ('b')
