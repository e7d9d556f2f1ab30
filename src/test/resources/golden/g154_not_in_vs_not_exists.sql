-- three-valued logic: one NULL empties NOT IN, NOT EXISTS is unaffected
SELECT
  (SELECT count(*) FROM nation
   WHERE n_nationkey NOT IN
     (SELECT CASE WHEN r_regionkey = 2 THEN NULL ELSE r_regionkey END
      FROM region)) AS not_in_nullable,
  (SELECT count(*) FROM nation n
   WHERE NOT EXISTS
     (SELECT 1 FROM region r
      WHERE CASE WHEN r_regionkey = 2 THEN NULL ELSE r_regionkey END
            = n.n_nationkey)) AS not_exists_nullable,
  (SELECT count(*) FROM nation
   WHERE n_nationkey NOT IN (SELECT r_regionkey FROM region)) AS not_in_clean
