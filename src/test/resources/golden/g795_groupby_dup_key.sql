-- groupby_duplicate_key.q: DISTINCT over a key plus two IDENTICAL
-- constant columns (the optimizer must not collapse the duplicate
-- grouping expressions into one), then the CTAS flavor.
DROP TABLE IF EXISTS g795_dummy;
CREATE TABLE g795_dummy USING parquet AS
SELECT DISTINCT n_nationkey, 'X' AS dummy1, 'X' AS dummy2
FROM nation WHERE n_nationkey < 10;
SELECT n_nationkey, dummy1, dummy2 FROM g795_dummy
