-- reference: ql/src/test/queries/clientpositive/insert_into_with_schema1.q
-- + insert_into_with_schema2.q + insert_into_with_schema3.q +
-- insert_into_with_schema4.q — target COLUMN LISTS on INSERT: unnamed
-- columns fill NULL, listed columns reorder, VALUES and SELECT sources,
-- and a partitioned target with a column list.
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1152_s;
DROP TABLE IF EXISTS g1152_p;
CREATE TABLE g1152_s (a INT, b INT, c INT) USING parquet;
INSERT INTO g1152_s (a) VALUES (1);
INSERT INTO g1152_s (b, c) VALUES (2, 3);
INSERT INTO g1152_s (c, a) SELECT 30, 10 FROM nation TABLESAMPLE (1 ROWS);
CREATE TABLE g1152_p (x INT, y INT)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT INTO g1152_p PARTITION (ds='1') (y) VALUES (7);
SELECT 's' AS t, a, b, c FROM g1152_s
UNION ALL
SELECT 'p', x, y, CAST(ds AS INT) FROM g1152_p
