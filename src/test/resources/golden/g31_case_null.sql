SELECT o_orderkey, CASE WHEN nullif(o_orderstatus,'O') IS NULL THEN 'open' ELSE o_orderstatus END AS st
FROM orders WHERE o_orderkey < 50
