-- vectorization_short_regress.q semantics (vectorized arithmetic must
-- equal row-mode exactly): mixed-type arithmetic with implicit up-casts,
-- negation, modulo on doubles and negatives, NOT over nullable
-- comparisons, disjunctive filters.
SELECT round(avg(l_quantity + CAST(l_linenumber AS DOUBLE)), 4)       AS c1,
       round(sum(-l_quantity), 2)                                      AS c2,
       round((sum(l_extendedprice) / count(l_extendedprice)) % 10.0, 6) AS c3,
       count(CASE WHEN NOT (l_discount > 0.05) THEN 1 END)             AS c4,
       round(max(l_tax * -563 % 10), 4)                                AS c5,
       min(CAST(l_quantity AS INT) % 7 - 3)                            AS c6,
       count(*)                                                        AS c7
FROM lineitem
WHERE l_orderkey % 11 != 3 OR l_linenumber > 2;
