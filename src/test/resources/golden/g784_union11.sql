-- union11.q: group-by OVER a union of three single-row aggregate
-- branches — each branch's count(1) is 1 after the union regroups.
SELECT unionsrc.key, count(1) AS cnt FROM (
  SELECT 'tst1' AS key, count(1) AS value FROM customer s1
  UNION ALL
  SELECT 'tst2' AS key, count(1) AS value FROM customer s2
  UNION ALL
  SELECT 'tst3' AS key, count(1) AS value FROM customer s3
) unionsrc GROUP BY unionsrc.key
