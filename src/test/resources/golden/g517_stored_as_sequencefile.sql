-- sequencefile DDL (the pre-ORC Hive default): CREATE TABLE ... STORED AS
-- SEQUENCEFILE runs natively through the DSv2 sequencefile source
-- (SequenceFile<BytesWritable,Text> with LazySimpleSerDe lines); insert,
-- read-back, NULLs and a timestamp column round-trip.
DROP TABLE IF EXISTS g517_t;
CREATE TABLE g517_t (k INT, name STRING, amt DOUBLE, ts TIMESTAMP) STORED AS SEQUENCEFILE;
INSERT INTO g517_t VALUES
  (1, 'one', 1.5, TIMESTAMP '2020-02-29 23:59:59'),
  (2, NULL, NULL, NULL),
  (3, 'three', -0.25, TIMESTAMP '1999-12-31 00:00:00');
SELECT k, name, amt, ts, name IS NULL AS name_null FROM g517_t
