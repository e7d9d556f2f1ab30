DROP TABLE IF EXISTS g105_t;
CREATE TABLE g105_t (k BIGINT, n BIGINT, side STRING) USING parquet PARTITIONED BY (side);
FROM customer
INSERT OVERWRITE TABLE g105_t PARTITION (side = 'lo') SELECT c_custkey, c_nationkey WHERE c_acctbal < 0
INSERT OVERWRITE TABLE g105_t PARTITION (side = 'hi') SELECT c_custkey, c_nationkey WHERE c_acctbal > 9000;
SELECT side, count(*) AS n FROM g105_t GROUP BY side
