SELECT bucket, o_orderkey FROM
  (SELECT o_custkey % 8 AS bucket, o_orderkey FROM orders WHERE o_orderkey <= 200
   DISTRIBUTE BY o_custkey % 8 SORT BY bucket, o_orderkey) t
