-- windowing_udaf2.q: an aggregate of an aggregate as a windowing function
-- (sum(sum(x)) over ()) — the outer window runs over the GROUP BY output
SELECT o_orderstatus,
  round(sum(o_totalprice) * 100) / 100 as grp_total,
  round(sum(sum(o_totalprice)) over () * 100) / 100 as grand_total,
  count(count(*)) over () as n_groups
FROM orders GROUP BY o_orderstatus
