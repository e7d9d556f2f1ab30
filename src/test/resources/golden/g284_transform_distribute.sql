-- mapreduce1.q shape: TRANSFORM with DISTRIBUTE BY + SORT BY
SELECT TRANSFORM(o_orderstatus, o_orderkey) USING 'cat' AS (st STRING, k BIGINT)
FROM (SELECT o_orderstatus, o_orderkey FROM orders WHERE o_orderkey <= 100
      DISTRIBUTE BY o_orderstatus SORT BY o_orderkey) t
