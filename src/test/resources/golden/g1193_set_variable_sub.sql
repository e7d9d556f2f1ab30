-- reference: ql/src/test/queries/clientpositive/set_variable_sub.q —
-- hivevar substitution: plain ${key}, qualified ${hivevar:key}, and
-- NESTED resolution ${hivevar:${hivevar:b}}.
set hivevar:key1=3;
set hivevar:a=5;
set hivevar:b=a;
SELECT
  (SELECT count(*) FROM nation WHERE n_nationkey = ${key1}) AS plain,
  (SELECT count(*) FROM nation WHERE n_nationkey = ${hivevar:key1}) AS qualified,
  (SELECT count(*) FROM nation WHERE n_nationkey = ${hivevar:${hivevar:b}}) AS nested
