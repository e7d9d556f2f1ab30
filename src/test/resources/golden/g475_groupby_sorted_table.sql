-- groupby_sort_1.q shape: aggregation whose group key IS the clustered+
-- sorted bucket key — Hive short-circuits the shuffle; rows must match
-- the plain aggregation either way.
DROP TABLE IF EXISTS g475_t;
CREATE TABLE g475_t (key STRING, val STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
INSERT INTO g475_t VALUES ('1','11'), ('2','12'), ('2','22'), ('3','13'), ('8','18'), ('8','28'), ('8','38');
SELECT key, count(1) AS cnt FROM g475_t GROUP BY key
