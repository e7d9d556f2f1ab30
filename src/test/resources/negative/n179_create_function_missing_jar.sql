-- reference: ql/src/test/queries/clientnegative shapes around
-- create_function_nonexistent_* — a CREATE FUNCTION whose USING JAR
-- resource does not exist must fail the CREATE loudly
-- (FunctionTask.addFunctionResources), not register a function that
-- explodes later.
-- ERROR-CONTAINS: resource does not exist | not found | no such file
CREATE TEMPORARY FUNCTION neg_jarless AS 'graftjar.NoSuchUdf' USING JAR '/no/such/path/neg_missing.jar';
SELECT neg_jarless(n_name) FROM nation LIMIT 1;
