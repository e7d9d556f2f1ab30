-- clientpositive/limit_pushdown_negative.q: shapes where the top-k
-- pushdown must NOT fire (limit under an outer join) — results stay
-- correct without it.
SELECT count(1) AS n FROM
  (SELECT c.c_custkey, o.o_orderkey
   FROM customer c LEFT OUTER JOIN
     (SELECT o_orderkey, o_custkey FROM orders LIMIT 50) o
   ON c.c_custkey = o.o_custkey) t;
