-- reference: ql/src/test/queries/clientnegative/
-- ptf_negative_PartitionBySortBy.q — the window grammar pairs PARTITION
-- BY with ORDER BY and DISTRIBUTE BY with SORT BY; mixing PARTITION BY
-- with SORT BY is a parse error ("missing ) at 'sort'"), not a silent
-- ORDER BY.
-- ERROR-CONTAINS: missing ) at 'sort'
SELECT p_brand, p_name, p_size,
sum(p_retailprice) OVER (PARTITION BY p_brand SORT BY p_brand) AS s1
FROM part;
