SELECT count(*) AS n_all, count(nullif(o_orderstatus, 'O')) AS n_nonnull
FROM orders
