-- the same subquery alias reused in sibling scopes
SELECT a.st, a.n, b.n AS n2 FROM
  (SELECT o_orderstatus AS st, count(*) AS n FROM orders GROUP BY o_orderstatus) a
JOIN
  (SELECT o_orderpriority AS st, count(*) AS n FROM orders GROUP BY o_orderpriority) b
ON length(a.st) <= length(b.st)
