-- subquery_exists.q: EXISTS behind a view
DROP VIEW IF EXISTS g175_cv;
CREATE TEMPORARY VIEW g175_cv AS
SELECT * FROM customer b WHERE EXISTS (
  SELECT a.o_custkey FROM orders a
  WHERE b.c_custkey = a.o_custkey AND a.o_totalprice > 250000);
SELECT count(*) AS n, min(c_custkey) AS k FROM g175_cv
