-- transform1.q / reduce.q: MAP and REDUCE as TRANSFORM synonyms
-- (SemanticAnalyzer genScriptPlan treats all three identically) — an
-- inner FROM-first MAP feeding an outer REDUCE, both through 'cat'.
FROM (
  FROM nation
  MAP n_nationkey, n_name USING 'cat' AS (k STRING, name STRING)
) m
REDUCE k, name USING 'cat' AS (k2 STRING, name2 STRING);
