-- udf7.q + udf_positive.q + udf_isnull.q: the remaining math/predicate
-- scalars — log family, ceiling alias, unary positive, isnull/isnotnull
-- as FUNCTIONS (not just IS NULL syntax), degree/radian conversions.
SELECT round(degrees(pi()) * 10000) / 10000   AS deg_pi,
       round(radians(180.0) * 1000000) / 1000000 AS rad_180,
       sign(-5.2)                              AS sgn_neg,
       sign(0.0)                               AS sgn_zero,
       log10(1000.0)                           AS l10,
       log2(8.0)                               AS l2,
       round(ln(exp(1.0)) * 100) / 100         AS ln_e,
       round(log(3.0, 81.0) * 100) / 100       AS log_base,
       ceiling(4.2)                            AS ceil_a,
       ceil(-4.2)                              AS ceil_n,
       positive(-3)                            AS pos_neg,
       negative(-3)                            AS neg_neg,
       isnull(NULL)                            AS is_n,
       isnull('x')                             AS is_n2,
       isnotnull(5)                            AS is_nn;
