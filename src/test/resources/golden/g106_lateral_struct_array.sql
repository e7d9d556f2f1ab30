WITH t AS (SELECT o_orderkey,
             array(named_struct('q', 1, 's', 'a'), named_struct('q', 2, 's', 'b')) AS xs
           FROM orders WHERE o_orderkey < 5)
SELECT o_orderkey, x.q AS q, x.s AS s FROM t LATERAL VIEW explode(xs) e AS x
