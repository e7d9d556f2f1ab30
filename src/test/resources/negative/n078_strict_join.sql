-- reference: ql/src/test/queries/clientnegative/strict_join.q (also input4.q)
-- strict mode refuses a join with no condition (cartesian product)
-- ERROR-CONTAINS: cartesian product is not allowed
SET hive.mapred.mode=strict;
SELECT * FROM nation n1 JOIN region r1;
