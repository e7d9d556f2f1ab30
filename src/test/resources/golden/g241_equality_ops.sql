-- == vs = vs <> vs != operator spellings
SELECT count(*) AS a FROM orders WHERE o_orderstatus == 'F';
SELECT
  (SELECT count(*) FROM orders WHERE o_orderstatus = 'F') AS eq1,
  (SELECT count(*) FROM orders WHERE o_orderstatus == 'F') AS eq2,
  (SELECT count(*) FROM orders WHERE o_orderstatus <> 'F') AS ne1,
  (SELECT count(*) FROM orders WHERE o_orderstatus != 'F') AS ne2
