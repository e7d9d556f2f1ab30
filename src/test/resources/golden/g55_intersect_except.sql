SELECT c_nationkey FROM customer WHERE c_acctbal > 0
INTERSECT
SELECT s_nationkey FROM supplier
