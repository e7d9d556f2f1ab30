-- show_tables.q: SHOW TABLES LIKE with a wildcard pattern
-- (DDLTask showTables; Hive's '*' glob maps onto Spark's same-syntax
-- pattern). The fixture views all live in the current (default) schema.
SHOW TABLES LIKE 'nat*';
