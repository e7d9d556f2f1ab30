-- udf_sort_array_by.q shape (GenericUDFSortArrayByField): sort an array of
-- structs by named fields, ASC default and explicit DESC, with a tiebreak field
SELECT
  sort_array_by(arr, 'sz') AS by_sz,
  sort_array_by(arr, 'sz', 'DESC') AS by_sz_desc,
  sort_array_by(arr, 'grp', 'sz') AS by_grp_then_sz
FROM (
  SELECT collect_list(named_struct('grp', p_brand, 'sz', p_size, 'nm', p_name)) AS arr
  FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 6) t) s
