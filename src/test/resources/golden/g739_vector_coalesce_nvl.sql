-- vectorization_short_regress.q null-pattern legs: coalesce/nvl/if over
-- nullable arithmetic.
SELECT count(1) AS n,
       sum(coalesce(l_quantity, 0)) AS cq,
       sum(nvl(l_discount, 0.5)) AS cd,
       sum(if(l_tax > 0.04, 1, 0)) AS taxed
FROM lineitem
WHERE l_orderkey < 1500;
