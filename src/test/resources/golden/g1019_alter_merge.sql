-- alter_merge.q: table-level CONCATENATE (no partition spec) — three
-- separate inserts' files merge, every row survives with its values.
DROP TABLE IF EXISTS g1019_am;
CREATE TABLE g1019_am (key INT, value STRING) USING parquet;
INSERT INTO g1019_am
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 9;
INSERT INTO g1019_am
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey BETWEEN 9 AND 14;
INSERT INTO g1019_am
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey > 14;
ALTER TABLE g1019_am CONCATENATE;
SELECT count(*) AS n, CAST(sum(key) AS BIGINT) AS s,
       min(value) AS mn, max(value) AS mx
FROM g1019_am
