-- correlationoptimizer1.q shape: join followed by GROUP BY on the join key
-- (one shared shuffle), aggregated through hash() like the reference test
SELECT sum(hash(tmp.key)) AS h1, sum(hash(tmp.cnt)) AS h2 FROM (
  SELECT c.c_custkey AS key, count(1) AS cnt
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey) tmp
