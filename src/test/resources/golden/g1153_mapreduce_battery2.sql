-- reference: ql/src/test/queries/clientpositive/mapreduce4.q +
-- mapreduce5.q + mapreduce6.q + mapreduce7.q + mapreduce8.q — the
-- MAP ... REDUCE shapes the first battery left: computed distribute
-- keys with DESCENDING sort, a reduce over the full row, and a
-- map-only pipe landed in a table.
DROP TABLE IF EXISTS g1153_dest;
CREATE TABLE g1153_dest (key INT, ten INT, one INT, value STRING)
  USING parquet;
FROM (
  FROM nation
  MAP nation.n_nationkey, CAST(nation.n_nationkey / 10 AS INT),
      CAST(nation.n_nationkey % 10 AS INT), nation.n_name
  USING 'cat'
  AS (tkey, ten, one, tvalue)
  DISTRIBUTE BY tvalue, tkey
  SORT BY ten DESC, one ASC
) tmap
INSERT OVERWRITE TABLE g1153_dest
  SELECT CAST(tkey AS INT), CAST(ten AS INT), CAST(one AS INT), tvalue;
SELECT count(*) AS n, sum(key) AS sk, max(ten) AS mt, min(one) AS mo
FROM g1153_dest
