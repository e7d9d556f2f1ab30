-- auto_join4.q: LEFT OUTER JOIN of two range-filtered derived tables with
-- only partial key overlap, checksummed like the reference (rows whose
-- right side is NULL must survive).
SELECT sum(hash(c.c1, c.c2, c.c3, c.c4)) AS hv, count(*) AS n FROM (
  SELECT a.c1, a.c2, b.c3, b.c4
  FROM (SELECT o_orderkey AS c1, o_orderstatus AS c2 FROM orders
        WHERE o_orderkey > 10 AND o_orderkey < 600) a
  LEFT OUTER JOIN
       (SELECT o_orderkey AS c3, o_orderstatus AS c4 FROM orders
        WHERE o_orderkey > 400 AND o_orderkey < 800) b
  ON (a.c1 = b.c3)
) c
