SELECT p_partkey FROM part
WHERE p_size > 40 AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
