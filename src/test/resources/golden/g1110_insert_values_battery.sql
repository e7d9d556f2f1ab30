-- reference: ql/src/test/queries/clientpositive/
-- insert_values_non_partitioned.q + insert_values_partitioned.q +
-- insert_values_dynamic_partitioned.q + insert_values_tmp_table.q —
-- INSERT ... VALUES into plain, static-partition, and
-- dynamic-partition targets, and through a temporary table.
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1110_plain;
DROP TABLE IF EXISTS g1110_part;
CREATE TABLE g1110_plain (i INT, s STRING) USING parquet;
INSERT INTO g1110_plain VALUES (1, 'one'), (2, 'two'), (3, NULL);
CREATE TABLE g1110_part (i INT)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT INTO g1110_part PARTITION (ds='static') VALUES (10), (11);
INSERT INTO g1110_part PARTITION (ds) VALUES (20, 'dyn1'), (21, 'dyn2');
CREATE TEMPORARY VIEW g1110_tmp AS SELECT i + 100 AS i FROM g1110_plain;
SELECT (SELECT count(*) FROM g1110_plain) AS n_plain,
       (SELECT count(s) FROM g1110_plain) AS nn_s,
       (SELECT count(DISTINCT ds) FROM g1110_part) AS n_parts,
       (SELECT sum(i) FROM g1110_part) AS sum_part,
       (SELECT sum(i) FROM g1110_tmp) AS sum_tmp
