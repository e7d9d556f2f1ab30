-- reference: ql/src/test/queries/clientnegative/windowing_ll_no_neg.q —
-- lag (and lead) with a NEGATIVE offset is refused (GenericUDFLeadLag:
-- "Lag amount can not be nagative"); silently flipping it into the
-- opposite function would be drift, not compatibility.
-- ERROR-CONTAINS: amount can not be negative
SELECT p_brand, p_name, p_size,
rank() OVER (DISTRIBUTE BY p_brand SORT BY p_name) AS r,
p_size - lag(p_size, -1, p_size) OVER (DISTRIBUTE BY p_brand SORT BY p_name) AS deltaSz
FROM part
GROUP BY p_brand, p_name, p_size;
