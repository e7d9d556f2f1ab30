-- describe_table.q: plain DESCRIBE — column name / type / comment rows
-- (DDLTask describeTable).
DESCRIBE nation;
