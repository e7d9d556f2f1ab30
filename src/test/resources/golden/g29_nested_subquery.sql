SELECT c_custkey FROM customer WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > (
    SELECT avg(o_totalprice) * 1.9 FROM orders))
