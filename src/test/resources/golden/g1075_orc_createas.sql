-- reference: ql/src/test/queries/clientpositive/orc_createas1.q — CTAS
-- into ORC (explicit serde/input/output format names on the source,
-- plain STORED AS ORC on the targets), content-hash equality between
-- source and both copies, one spray-by-key variant.
DROP TABLE IF EXISTS g1075_src;
DROP TABLE IF EXISTS g1075_orc;
DROP TABLE IF EXISTS g1075_orc2;
CREATE TABLE g1075_src STORED AS TEXTFILE AS
  SELECT CAST(n_nationkey AS INT) AS key, n_name AS value FROM nation;
CREATE TABLE g1075_orc STORED AS ORC AS SELECT * FROM g1075_src;
CREATE TABLE g1075_orc2 STORED AS ORC AS
  SELECT key, value FROM g1075_src CLUSTER BY key;
SELECT
  (SELECT sum(hash(key, value)) FROM g1075_src) =
    (SELECT sum(hash(key, value)) FROM g1075_orc) AS same_plain,
  (SELECT sum(hash(key, value)) FROM g1075_src) =
    (SELECT sum(hash(key, value)) FROM g1075_orc2) AS same_spray,
  (SELECT count(*) FROM g1075_orc) AS cnt
