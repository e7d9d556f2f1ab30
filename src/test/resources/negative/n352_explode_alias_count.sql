-- reference: ql/src/test/queries/clientnegative/
-- udtf_explode_not_supported2.q — exploding a MAP into THREE aliases
-- refuses: map explode yields exactly (key, value).
-- ERROR-CONTAINS: aliases | number | expected 2
SELECT explode(map(1, 'one', 2, 'two')) AS (myKey, myVal, myVal2)
FROM nation;
