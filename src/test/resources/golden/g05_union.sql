SELECT o_custkey FROM orders WHERE o_totalprice > 490000
UNION
SELECT o_custkey FROM orders WHERE o_totalprice < 1500
