-- reference: ql/src/test/queries/clientnegative/drop_function_failure.q
-- — DROP TEMPORARY FUNCTION without IF EXISTS on an unknown function
-- refuses.
-- ERROR-CONTAINS: UnknownFunction | not found | does not exist
set hive.exec.drop.ignorenonexistent=false;
DROP TEMPORARY FUNCTION UnknownFunction;
