-- reference: ql/src/test/queries/clientnegative/fileformat_bad_class.q
-- — STORED AS INPUTFORMAT naming a class that does not exist refuses
-- (the engine maps only the known Hive IO class pairs).
-- ERROR-CONTAINS: ClassDoesNotExist | input format | not supported | cannot recognize
CREATE TABLE neg341_dest (key INT, value STRING) STORED AS
  INPUTFORMAT 'ClassDoesNotExist'
  OUTPUTFORMAT 'java.lang.Void';
