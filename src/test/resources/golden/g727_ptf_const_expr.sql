-- ptf_general_queries.q case 3 (testConstExprInSelect).
SELECT 'tst1' AS key, count(1) AS value FROM part;
