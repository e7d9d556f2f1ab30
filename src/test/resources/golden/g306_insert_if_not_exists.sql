-- insert1_overwrite_partitions.q: INSERT OVERWRITE ... PARTITION (static)
-- IF NOT EXISTS — the insert is skipped when the target partition already
-- exists (SemanticAnalyzer; fully-static specs only). The second write
-- into p='a' must NOT overwrite 'first'.
DROP TABLE IF EXISTS g306_t;
CREATE TABLE g306_t (v STRING, p STRING) USING parquet PARTITIONED BY (p);
INSERT OVERWRITE TABLE g306_t PARTITION (p='a') IF NOT EXISTS SELECT 'first';
INSERT OVERWRITE TABLE g306_t PARTITION (p='a') IF NOT EXISTS SELECT 'second';
INSERT OVERWRITE TABLE g306_t PARTITION (p='b') IF NOT EXISTS SELECT 'fresh';
SELECT p, v FROM g306_t ORDER BY p;
