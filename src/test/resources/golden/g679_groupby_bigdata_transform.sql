-- groupby_bigdata.q / rcfile_bigdata.q shape: a script TRANSFORM feeding
-- a GROUP BY over a larger input (lineitem) — the reduce side groups the
-- script's output, the big-data variant of the transform contract.
SELECT grp, COUNT(*) AS n FROM (
  SELECT TRANSFORM(l_orderkey % 7, l_linenumber) USING 'cut -f1' AS (grp)
  FROM (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey < 3000) src
) t GROUP BY grp
