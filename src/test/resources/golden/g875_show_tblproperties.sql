-- show_tblproperties.q: SHOW TBLPROPERTIES with a KEYED lookup — the
-- keyed form returns exactly the one property value (db-qualified
-- spelling exercised mid-script) and reflects ALTER SET TBLPROPERTIES.
DROP TABLE IF EXISTS g875_foo;
CREATE TABLE g875_foo (a STRING) USING parquet;
ALTER TABLE g875_foo SET TBLPROPERTIES ('bar' = 'bar value');
ALTER TABLE g875_foo SET TBLPROPERTIES ('tmp' = 'true');
SHOW TBLPROPERTIES default.g875_foo('tmp');
SHOW TBLPROPERTIES g875_foo('bar')
