SELECT c_custkey, concat(c_mktsegment, ':', CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END) AS tag
FROM customer WHERE c_custkey < 60
