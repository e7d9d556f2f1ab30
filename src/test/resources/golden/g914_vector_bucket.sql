-- vector_bucket.q: INSERT ... VALUES into a CLUSTERED BY (bucketed)
-- table — rows land and read back complete regardless of bucket
-- assignment; duplicate values are kept.
DROP TABLE IF EXISTS g914_nb;
CREATE TABLE g914_nb (a INT, b STRING) USING parquet
  CLUSTERED BY (a) INTO 2 BUCKETS;
INSERT INTO g914_nb VALUES (1, 'one'), (1, 'one'), (2, 'two'), (3, 'three');
SELECT a, b FROM g914_nb ORDER BY a, b
