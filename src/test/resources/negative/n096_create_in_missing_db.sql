-- reference: ql/src/test/queries/clientnegative/create_table_failure3.q
-- CREATE TABLE in a database that does not exist is refused
-- ERROR-CONTAINS: SCHEMA_NOT_FOUND | database | not found
CREATE TABLE graft_no_such_db_xyz.neg_t (a STRING) USING parquet;
