-- reference: ql/src/test/queries/clientnegative/ptf_negative_DuplicateWindowAlias.q
-- the same WINDOW alias defined twice
-- ERROR-CONTAINS: REPETITIVE_WINDOW_DEFINITION | is repetitive
SELECT sum(o_totalprice) OVER w1 AS s1 FROM orders
WINDOW w1 AS (PARTITION BY o_custkey), w1 AS (PARTITION BY o_orderstatus);
