-- Numeric-typed partition values compare by VALUE: DROP PARTITION
-- (hr=01) names the same logical partition as the stored hr=1 directory
-- (the metastore's numeric comparator on an INT partition column).
-- reference: ql/src/test/queries/clientpositive/drop_partitions_filter2.q
DROP TABLE IF EXISTS g695_t;
CREATE TABLE g695_t (v INT) USING `graft-seq` PARTITIONED BY (hr INT);
INSERT INTO g695_t PARTITION (hr=1) VALUES (10);
INSERT INTO g695_t PARTITION (hr=2) VALUES (20);
ALTER TABLE g695_t DROP PARTITION (hr=01);
SELECT v, hr FROM g695_t
