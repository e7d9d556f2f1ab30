-- reference: ql/src/test/queries/clientpositive/complex_alias.q (+
-- nomore_ambiguous_table_col.q — a table alias equal to a COLUMN name
-- stays unambiguous) — nested single-use subqueries with re-aliased
-- columns through a join over a union.
DROP TABLE IF EXISTS g1185_agg1;
DROP TABLE IF EXISTS g1185_amb;
CREATE TABLE g1185_agg1 (col0 INT, col1 STRING, col2 DOUBLE) USING parquet;
INSERT INTO g1185_agg1
  SELECT CAST(n_nationkey AS INT), n_name, CAST(n_nationkey AS DOUBLE)
  FROM nation TABLESAMPLE (1 ROWS);
CREATE TABLE g1185_amb (key STRING, value STRING) USING parquet;
FROM nation key
INSERT OVERWRITE TABLE g1185_amb
  SELECT key.n_name, CAST(key.n_nationkey AS STRING)
  WHERE key.n_nationkey < 3;
SELECT s12.a1 AS a1, s11.a2 AS a2,
       (SELECT count(*) FROM g1185_amb) AS amb_rows
FROM (SELECT sum(g1185_agg1.col2) AS a1 FROM g1185_agg1
      GROUP BY g1185_agg1.col0) s12
JOIN (SELECT alias.a2 AS a0, alias.a1 AS a1, alias.a1 AS a2
      FROM (SELECT g1185_agg1.col1 AS a0, '42' AS a1, g1185_agg1.col0 AS a2
            FROM g1185_agg1
            UNION ALL
            SELECT g1185_agg1.col1 AS a0, '41' AS a1, g1185_agg1.col0 AS a2
            FROM g1185_agg1) alias
      GROUP BY alias.a2, alias.a1) s11
ON s12.a1 = CAST(s11.a0 AS DOUBLE) OR s11.a1 = '42'
