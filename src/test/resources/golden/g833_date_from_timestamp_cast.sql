-- date_3.q: a DATE column ADDED via ALTER TABLE ... ADD COLUMNS, filled
-- from a timestamp→date cast (pre-existing rows read NULL for the new
-- column; the insert writes the cast value).
DROP TABLE IF EXISTS g833_d3;
CREATE TABLE g833_d3 (c1 INT) USING parquet;
ALTER TABLE g833_d3 ADD COLUMNS (c2 DATE);
INSERT OVERWRITE TABLE g833_d3
  SELECT 1, cast(cast('2011-01-01 00:00:00' as timestamp) as date);
SELECT * FROM g833_d3
