-- reference: ql/src/test/queries/clientpositive/
-- test_boolean_whereclause.q + sum_expr_with_order.q +
-- tablename_with_select.q + semicolon.q (comment-with-semicolon
-- handling exercised by this very script's header) — a bare boolean
-- column as the WHERE clause; ordering by an aliased cast-sum;
-- a table named like a keyword-adjacent identifier.
DROP TABLE IF EXISTS g1125_bool;
DROP TABLE IF EXISTS g1125_tmp_select;
CREATE TABLE g1125_bool (dummy TINYINT) USING parquet;
INSERT OVERWRITE TABLE g1125_bool
  SELECT CAST(1 AS TINYINT) FROM nation TABLESAMPLE (1 ROWS);
CREATE TABLE g1125_tmp_select (a INT, b STRING) USING parquet;
INSERT OVERWRITE TABLE g1125_tmp_select
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
SELECT
  (SELECT 1 FROM (SELECT TRUE AS flag FROM g1125_bool) a WHERE flag) AS bool_where,
  (SELECT CAST(sum(a) * 100 AS DECIMAL(15,3)) FROM g1125_tmp_select) AS c1,
  (SELECT count(*) FROM g1125_tmp_select) AS n
