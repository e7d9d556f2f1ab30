-- alter_char1.q: CHANGE COLUMN string→char(20) keeps contents, →char(3)
-- TRUNCATES the read view ("value column should be truncated now"),
-- back →char(20) restores full values ("column values should be full
-- size again" — the CHANGE is metadata-only, the data never rewrites),
-- and ADD COLUMNS backfills NULL. The mid-state probe materializes the
-- truncated view into a table so one final SELECT pins every stage.
DROP TABLE IF EXISTS g894_ac;
DROP TABLE IF EXISTS g894_mid;
CREATE TABLE g894_ac (key STRING, value STRING) USING parquet;
INSERT OVERWRITE TABLE g894_ac
  SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 5;
ALTER TABLE g894_ac CHANGE COLUMN value value CHAR(20);
ALTER TABLE g894_ac CHANGE COLUMN value value CHAR(3);
CREATE TABLE g894_mid USING parquet AS
  SELECT key, value AS mid_value FROM g894_ac;
ALTER TABLE g894_ac CHANGE COLUMN value value CHAR(20);
ALTER TABLE g894_ac ADD COLUMNS (key2 INT, value2 CHAR(10));
SELECT a.key, a.value, length(a.value) AS vlen, m.mid_value,
       length(m.mid_value) AS midlen, a.key2, a.value2
FROM g894_ac a JOIN g894_mid m ON a.key = m.key
ORDER BY a.key
