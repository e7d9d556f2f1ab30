-- ORDER BY inside a subquery with outer LIMIT semantics
SELECT st, tp FROM (
  SELECT o_orderstatus AS st, o_totalprice AS tp FROM orders
  ORDER BY o_totalprice DESC LIMIT 10) t
WHERE tp > 0
