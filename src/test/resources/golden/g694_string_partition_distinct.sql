-- String-typed partition values compare by EXACT TEXT: p='1' and p='01'
-- are distinct partitions (the metastore's string comparator; numeric
-- matching applies only to numeric-typed partition columns, see g695).
-- reference: ql/src/test/queries/clientpositive/drop_partitions_filter.q
DROP TABLE IF EXISTS g694_t;
CREATE TABLE g694_t (v INT) USING `graft-seq` PARTITIONED BY (p STRING);
INSERT INTO g694_t PARTITION (p='01') VALUES (10);
INSERT INTO g694_t PARTITION (p='1') VALUES (20);
INSERT INTO g694_t PARTITION (p='001') VALUES (30);
ALTER TABLE g694_t DROP PARTITION (p='1');
SELECT v, p FROM g694_t
