-- vector_aggregate_9.q: min/max/sum/avg over a DECIMAL(38,18) column
-- including NULLs (ignored by all four) — the reference's vectortab2korc
-- aggregate, here over values exercising sign, scale, and null mix.
DROP TABLE IF EXISTS g884_v;
CREATE TABLE g884_v (dc DECIMAL(38,18)) USING parquet;
INSERT INTO g884_v VALUES
  (1234567890.123456789012345678), (-0.000000000000000001),
  (42), (NULL), (0.5);
SELECT min(dc) AS mn, max(dc) AS mx, sum(dc) AS sm, avg(dc) AS av,
       count(dc) AS cnt_nonnull, count(*) AS cnt_all
FROM g884_v
