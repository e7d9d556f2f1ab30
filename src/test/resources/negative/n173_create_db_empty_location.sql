-- reference: ql/src/test/queries/clientnegative/database_create_invalid_name.q
-- (database-validation family): empty LOCATION
-- ERROR-CONTAINS: INVALID_EMPTY_LOCATION | cannot be empty
CREATE DATABASE neg_bad_db LOCATION '';
