-- reference: the udtf_not_supported placement family — a UDTF cannot
-- run outside the SELECT list; ORDER BY is not a generator site
-- ERROR-CONTAINS: generator | explode | unsupported_generator
SELECT n_name FROM nation ORDER BY explode(array(1, 2));
