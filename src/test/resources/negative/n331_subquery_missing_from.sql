-- reference: ql/src/test/queries/clientnegative/subquery_missing_from.q
-- — an IN subquery with no FROM clause refuses ("From clause is
-- missing in SubQuery"): the lone select item would resolve as an
-- outer reference, silently making the predicate a tautology.
-- ERROR-CONTAINS: From clause is missing
SELECT * FROM nation WHERE n_nationkey IN (SELECT n_nationkey);
