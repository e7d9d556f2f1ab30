-- reference: ql/src/test/queries/clientnegative/clusterbyorderby.q
-- CLUSTER BY already orders; combining it with ORDER BY is rejected
-- ERROR-CONTAINS: PARSE_SYNTAX_ERROR | Syntax error
SELECT n_name FROM nation CLUSTER BY n_name ORDER BY n_name;
