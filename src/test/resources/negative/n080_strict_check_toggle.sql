-- reference: HiveConf hive.strict.checks.* (fine-grained successors of
-- hive.mapred.mode=strict); the individual toggle fires without the
-- legacy mode being set
-- ERROR-CONTAINS: ORDER BY is specified, LIMIT must also be specified
SET hive.strict.checks.orderby.no.limit=true;
SELECT n_name FROM nation ORDER BY n_name;
