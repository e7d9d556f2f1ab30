SELECT o_orderstatus AS v FROM orders
UNION
SELECT l_returnflag AS v FROM lineitem
