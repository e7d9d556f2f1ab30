-- reference: ql/src/test/queries/clientnegative/select_udtf_alias.q
-- explode yields one column; two aliases are refused
-- ERROR-CONTAINS: ALIASES_MISMATCH | expected 2 aliases | number of aliases
SELECT explode(array(1,2,3)) AS (myCol1, myCol2) LIMIT 3;
