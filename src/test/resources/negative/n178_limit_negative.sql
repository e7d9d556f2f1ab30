-- reference: ql/src/test/queries/clientnegative/clustern4.q
-- (sort/limit-clause validation family): a negative LIMIT
-- ERROR-CONTAINS: INVALID_LIMIT_LIKE_EXPRESSION | must be equal to or greater
SELECT * FROM nation LIMIT -1;
