-- reference: ql/src/test/queries/clientnegative/groupby_key.q
-- an expression over a non-grouped column outside any aggregate
-- ERROR-CONTAINS: MISSING_AGGREGATION | not participating in the GROUP BY
SELECT concat(n_name, cast(n_nationkey AS string)) FROM nation GROUP BY n_name;
