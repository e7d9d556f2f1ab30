-- load_dyn_part2.q: wide fan-out — one partition per nation key (25
-- dirs), then a full-table aggregate and a single-partition prune.
DROP TABLE IF EXISTS g602_t;
CREATE TABLE g602_t (v STRING) USING parquet PARTITIONED BY (k INT);
INSERT OVERWRITE TABLE g602_t PARTITION (k)
  SELECT n_name, n_nationkey FROM nation;
SELECT COUNT(DISTINCT k) AS n_parts,
       (SELECT v FROM g602_t WHERE k = 7) AS part7,
       COUNT(*) AS n_rows
FROM g602_t
