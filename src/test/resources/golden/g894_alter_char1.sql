-- alter_char1.q: CHANGE COLUMN string→char(20) keeps contents, →char(3)
-- TRUNCATES the read view, back →char(20) restores full values (the
-- underlying data never changed), and ADD COLUMNS backfills NULL.
DROP TABLE IF EXISTS g894_ac;
CREATE TABLE g894_ac (key STRING, value STRING) USING parquet;
INSERT OVERWRITE TABLE g894_ac
  SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 5;
ALTER TABLE g894_ac CHANGE COLUMN value value CHAR(20);
ALTER TABLE g894_ac CHANGE COLUMN value value CHAR(3);
ALTER TABLE g894_ac CHANGE COLUMN value value CHAR(20);
ALTER TABLE g894_ac ADD COLUMNS (key2 INT, value2 CHAR(10));
SELECT key, value, length(value) AS vlen, key2, value2
FROM g894_ac ORDER BY key
