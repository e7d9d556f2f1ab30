-- NOT IN three-valued logic: a NULL in the subquery column makes NOT IN
-- unknowable for every non-member, so the 'nullable' branch is empty while
-- the NULL-free branch anti-joins normally (QBSubQuery.java:42-57).
SELECT 'clean' AS tag, c_custkey FROM customer
WHERE c_custkey < 60
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey < 30)
UNION ALL
SELECT 'nullable' AS tag, c_custkey FROM customer
WHERE c_custkey < 60
  AND c_custkey NOT IN
    (SELECT CASE WHEN o_custkey >= 20 THEN NULL ELSE o_custkey END
     FROM orders WHERE o_custkey < 30);
