SELECT o_orderkey,
  CASE o_orderstatus WHEN 'O' THEN CASE WHEN o_totalprice > 250000 THEN 'open-big' ELSE 'open-small' END
                     ELSE 'done' END AS klass
FROM orders WHERE o_orderkey < 80
