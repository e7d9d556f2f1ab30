-- auto_join0.q shape: unconditioned self join + WHERE, aggregated
SELECT sum(k1 + k2 * 10) AS s FROM (
  SELECT a.n_nationkey AS k1, b.n_nationkey AS k2
  FROM nation a JOIN nation b
  WHERE a.n_nationkey < 10 AND b.n_nationkey < 10) t
