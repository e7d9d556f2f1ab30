SELECT c_custkey, upper(substr(c_name, 1, 8)) AS u, length(c_name) AS ln
FROM customer WHERE c_custkey < 40
