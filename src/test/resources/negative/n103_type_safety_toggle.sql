-- hive.strict.checks.type.safety fires via the fine-grained toggle
-- without the legacy mode being set (the n080 pattern)
-- ERROR-CONTAINS: comparing bigints and strings
SET hive.strict.checks.type.safety=true;
SELECT * FROM orders WHERE o_orderkey = '1' LIMIT 5;
