-- reference: ql/src/test/queries/clientnegative/genericFileFormat.q —
-- STORED AS with an unknown format keyword refuses.
-- ERROR-CONTAINS: foo | file format | not supported | cannot recognize
CREATE TABLE neg342_fail (a INT) STORED AS foo;
