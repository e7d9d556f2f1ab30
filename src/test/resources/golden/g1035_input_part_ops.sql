-- reference: ql/src/test/queries/clientpositive/input24.q (count over a
-- just-added EMPTY partition = 0 rows, not an error) + input28.q
-- (INSERT into a partition from a join whose left side is the empty
-- partition itself — inserts nothing) + input42.q (partition filter
-- combined with a residual column filter).
DROP TABLE IF EXISTS g1035_tst;
CREATE TABLE g1035_tst (a STRING, b STRING) USING parquet PARTITIONED BY (d STRING);
ALTER TABLE g1035_tst ADD PARTITION (d='2009-01-01');
SELECT count(1) AS empty_cnt FROM g1035_tst x WHERE x.d = '2009-01-01';
INSERT OVERWRITE TABLE g1035_tst PARTITION (d='2009-01-01')
  SELECT g1035_tst.a, nation.n_name FROM g1035_tst JOIN nation ON (g1035_tst.a = cast(nation.n_nationkey AS STRING));
INSERT INTO g1035_tst PARTITION (d='2009-01-02')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation;
SELECT 'empty_after_selfjoin' AS tag, count(1) AS n FROM g1035_tst WHERE d='2009-01-01'
UNION ALL
SELECT 'filtered', count(1) FROM g1035_tst a WHERE a.d='2009-01-02' AND a.a < '2'
UNION ALL
SELECT 'all', count(1) FROM g1035_tst;
