-- UPDATE/DELETE on a STORED AS ORC table: the copy-on-write rewrite must
-- produce ORC files (the table's own format), not parquet.
DROP TABLE IF EXISTS g466_t;
CREATE TABLE g466_t (k INT, v STRING, amt DOUBLE) STORED AS ORC;
INSERT INTO g466_t SELECT n_nationkey, n_name, n_nationkey * 1.5 FROM nation;
UPDATE g466_t SET amt = amt * 2 WHERE k < 5;
DELETE FROM g466_t WHERE k >= 20;
SELECT count(*) AS n, round(sum(amt) * 100) / 100 AS s, min(k) AS mn, max(k) AS mx FROM g466_t
