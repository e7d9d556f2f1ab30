-- outer-join ON-clause semantics: a right-side predicate in LEFT JOIN ON
-- must NOT filter left rows — it only suppresses matches
SELECT count(*) AS total, count(n_name) AS matched
FROM supplier LEFT JOIN nation
  ON s_nationkey = n_nationkey AND n_regionkey = 1
