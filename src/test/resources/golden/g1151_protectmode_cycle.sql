-- reference: ql/src/test/queries/clientpositive/protectmode2.q (+
-- protectmode_tbl2.q..protectmode_tbl8.q) — ENABLE/DISABLE OFFLINE and
-- NO_DROP cycles: a re-enabled table reads again, NO_DROP lifts after
-- DISABLE, and the modes stack independently.
DROP TABLE IF EXISTS g1151_t;
CREATE TABLE g1151_t USING parquet AS
  SELECT n_nationkey AS c FROM nation WHERE n_nationkey < 5;
ALTER TABLE g1151_t ENABLE OFFLINE;
ALTER TABLE g1151_t DISABLE OFFLINE;
ALTER TABLE g1151_t ENABLE NO_DROP;
ALTER TABLE g1151_t DISABLE NO_DROP;
ALTER TABLE g1151_t ENABLE NO_DROP;
ALTER TABLE g1151_t ENABLE OFFLINE;
ALTER TABLE g1151_t DISABLE OFFLINE;
ALTER TABLE g1151_t DISABLE NO_DROP;
SELECT count(*) AS n, sum(c) AS s FROM g1151_t
