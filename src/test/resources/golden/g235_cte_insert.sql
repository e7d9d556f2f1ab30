-- WITH ... INSERT (CTE feeding a write)
DROP TABLE IF EXISTS g235_t;
CREATE TABLE g235_t (st STRING, n BIGINT) USING parquet;
WITH agg AS (SELECT o_orderstatus AS st, count(*) AS n FROM orders GROUP BY o_orderstatus)
INSERT OVERWRITE TABLE g235_t SELECT st, n FROM agg WHERE n > 10;
SELECT st, n FROM g235_t
