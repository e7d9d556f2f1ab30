-- order_null.q: Hive sorts NULLs FIRST ascending, LAST descending;
-- pin via rank positions (canonical row sort hides output order).
SELECT v, pos_asc, pos_desc FROM (
  SELECT v,
    ROW_NUMBER() OVER (ORDER BY v ASC) AS pos_asc,
    ROW_NUMBER() OVER (ORDER BY v DESC) AS pos_desc
  FROM (SELECT CASE WHEN n_nationkey = 3 THEN NULL ELSE n_nationkey END AS v
        FROM nation WHERE n_nationkey < 6) x) y
