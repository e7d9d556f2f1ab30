-- reference: the udtf_not_supported family (UDTF nested in an
-- expression) — explode inside CASE is not a valid generator placement
-- ERROR-CONTAINS: generator | explode | unsupported_generator
SELECT CASE WHEN n_nationkey > 0 THEN explode(array(1, 2)) ELSE 0 END FROM nation;
