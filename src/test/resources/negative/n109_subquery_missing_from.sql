-- reference: ql/src/test/queries/clientnegative/subquery_missing_from.q
-- IN-subquery with no FROM: refused up front by the parse-time guard
-- (r17 checkSubqueryMissingFrom) with the reference's "From clause is
-- missing" shape — before Spark would either fail the unresolvable
-- inner name or, worse, resolve it as an outer reference (n331 pins
-- that tautology case).
-- ERROR-CONTAINS: From clause is missing | cannot be resolved
SELECT * FROM nation WHERE n_nationkey IN (SELECT n_missing);
