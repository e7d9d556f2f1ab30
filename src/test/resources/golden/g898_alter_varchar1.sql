-- alter_varchar1.q: CHANGE COLUMN string→varchar(20) keeps contents,
-- →varchar(3) truncates the read view, back →varchar(20) restores, and
-- new varchar columns added via ADD COLUMNS fill with data on the next
-- overwrite.
DROP TABLE IF EXISTS g898_av;
CREATE TABLE g898_av (key STRING, value STRING) USING parquet;
INSERT OVERWRITE TABLE g898_av
  SELECT r_regionkey, r_name FROM region;
ALTER TABLE g898_av CHANGE COLUMN value value VARCHAR(20);
ALTER TABLE g898_av CHANGE COLUMN value value VARCHAR(3);
ALTER TABLE g898_av CHANGE COLUMN value value VARCHAR(20);
ALTER TABLE g898_av ADD COLUMNS (key2 INT, value2 VARCHAR(12));
INSERT OVERWRITE TABLE g898_av
  SELECT r_regionkey, r_name, r_regionkey, r_name FROM region;
SELECT key, value, key2, value2, length(value2) AS v2len
FROM g898_av ORDER BY key
