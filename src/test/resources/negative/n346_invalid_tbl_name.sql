-- reference: ql/src/test/queries/clientnegative/invalid_tbl_name.q —
-- a hyphen in an unquoted table name is a parse error.
-- ERROR-CONTAINS: invalid-name | syntax | parse
CREATE TABLE invalid-name (a INT, b STRING);
